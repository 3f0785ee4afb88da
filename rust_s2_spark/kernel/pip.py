"""Point-in-polygon: robust predicates, edge crossings, Loop, Polygon.

Parity: /root/reference/src/s2/predicates.rs:47-237 (sign chain),
edge_crosser.rs:56-347 (EdgeCrosser), edge_crossings.rs:109-146
(vertex_crossing / edge_or_vertex_crossing), rect_bounder.rs:60-330,
loop.rs:105-445 (init, origin_inside, bound, contains_point),
polygon.rs:786-810 (odd-loop containment).

The exact tier (predicates.rs:229-237) is a stub in the reference — "always
Indeterminate".  We implement it honestly: exact determinant over Python
Fraction plus the canonical symbolic-perturbation tie-break, applied only to
the (vanishingly rare) rows the triage/stable tiers cannot decide.

Hot path is ``Loop.contains_points`` — all points x all edges as numpy
einsums (the cluster analog of loop.rs:436-445 brute force, with per-cell
pruning supplied by the Spark join instead of ShapeIndex).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from .constants import DBL_EPSILON
from . import hierarchy, hilbert
from .region import (
    Cap,
    Rect,
    RInterval,
    SInterval,
    chord2_between,
    chord_from_angle,
    PI,
    _latlng_point,
)

# predicates.rs:47,57
MAX_DETERMINANT_ERROR = 1.8274 * DBL_EPSILON
DET_ERROR_MULTIPLIER = 3.2321 * DBL_EPSILON

# Fixed reference point (point.rs:114-118)
ORIGIN = np.array([-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195])

CCW, INDETERMINATE, CW = 1, 0, -1

# Crossing codes (edge_crossings.rs:41-46)
DO_NOT_CROSS, MAYBE_CROSS, CROSS = -1, 0, 1


# ---------------------------------------------------------------------------
# Sign predicates (predicates.rs:88-237)
# ---------------------------------------------------------------------------


def sign(a, b, c) -> bool:
    """Simple CCW test: (c x a) . b > 0 (predicates.rs:88-100)."""
    return float(np.cross(c, a) @ b) > 0


def triage_sign(a, b, c) -> int:
    """det vs 1.8274*eps error bound (predicates.rs:191-200)."""
    det = float(np.cross(a, b) @ c)
    if det > MAX_DETERMINANT_ERROR:
        return CCW
    if det < -MAX_DETERMINANT_ERROR:
        return CW
    return INDETERMINATE


def stable_sign(a, b, c) -> int:
    """Recompute with the longest edge eliminated (predicates.rs:147-183)."""
    ab = b - a
    bc = c - b
    ca = a - c
    ab2 = float(ab @ ab)
    bc2 = float(bc @ bc)
    ca2 = float(ca @ ca)
    if ab2 >= bc2 and ab2 >= ca2:
        det = -float(np.cross(ca, bc) @ c)
        max_err = DET_ERROR_MULTIPLIER * math.sqrt(ca2 * bc2)
    elif bc2 >= ca2:
        det = -float(np.cross(ab, ca) @ a)
        max_err = DET_ERROR_MULTIPLIER * math.sqrt(ab2 * ca2)
    else:
        det = -float(np.cross(bc, ab) @ b)
        max_err = DET_ERROR_MULTIPLIER * math.sqrt(bc2 * ab2)
    if det > max_err:
        return CCW
    if det < -max_err:
        return CW
    return INDETERMINATE


def _frac(v: np.ndarray) -> tuple[Fraction, Fraction, Fraction]:
    return (Fraction(float(v[0])), Fraction(float(v[1])), Fraction(float(v[2])))


def _sym_perturbed_sign(a, b, c) -> int:
    """Simulation-of-simplicity tie-break for exactly-degenerate triples.

    Canonical S2 perturbation sequence (the reference stubs this out at
    predicates.rs:229-237; semantics follow the published S2 algorithm so that
    Sign(a,b,c) is a total order even for collinear points)."""
    bxc = (
        b[1] * c[2] - b[2] * c[1],
        b[2] * c[0] - b[0] * c[2],
        b[0] * c[1] - b[1] * c[0],
    )
    checks = [
        bxc[2],
        bxc[1],
        bxc[0],
        c[0] * a[1] - c[1] * a[0],
        c[0],
        -c[1],
        c[2] * a[0] - c[0] * a[2],
        c[2],
        a[0] * b[1] - a[1] * b[0],
        -b[0],
        b[1],
        a[0],
    ]
    for v in checks:
        if v > 0:
            return CCW
        if v < 0:
            return CW
    return CCW


def exact_sign(a, b, c, perturb: bool = True) -> int:
    """Exact-arithmetic sign via Fraction (replaces the reference's stub)."""
    pts = [tuple(a), tuple(b), tuple(c)]
    s = CCW
    # Sort lexicographically, tracking permutation parity.
    if pts[0] > pts[1]:
        pts[0], pts[1] = pts[1], pts[0]
        s = -s
    if pts[1] > pts[2]:
        pts[1], pts[2] = pts[2], pts[1]
        s = -s
    if pts[0] > pts[1]:
        pts[0], pts[1] = pts[1], pts[0]
        s = -s
    fa = _frac(np.asarray(pts[0]))
    fb = _frac(np.asarray(pts[1]))
    fc = _frac(np.asarray(pts[2]))
    det = (
        fa[0] * (fb[1] * fc[2] - fb[2] * fc[1])
        - fa[1] * (fb[0] * fc[2] - fb[2] * fc[0])
        + fa[2] * (fb[0] * fc[1] - fb[1] * fc[0])
    )
    if det > 0:
        return s * CCW
    if det < 0:
        return s * CW
    if not perturb:
        return INDETERMINATE
    return s * _sym_perturbed_sign(fa, fb, fc)


def expensive_sign(a, b, c) -> int:
    """predicates.rs:205-226 (with a real exact tier)."""
    if np.array_equal(a, b) or np.array_equal(b, c) or np.array_equal(c, a):
        return INDETERMINATE
    det_sign = stable_sign(a, b, c)
    if det_sign != INDETERMINATE:
        return det_sign
    return exact_sign(a, b, c, perturb=True)


def robust_sign(a, b, c) -> int:
    """Never Indeterminate for distinct points (predicates.rs:126-133)."""
    s = triage_sign(a, b, c)
    if s == INDETERMINATE:
        s = expensive_sign(a, b, c)
    return s


# ---------------------------------------------------------------------------
# Vertex crossings (edge_crossings.rs:109-146)
# ---------------------------------------------------------------------------


def get_frame(p: np.ndarray) -> np.ndarray:
    """Right-handed orthonormal frame at unit point p: columns (x, y, z)
    with z = p and (x, y) spanning the tangent space (point.rs:226-240)."""
    z = np.asarray(p, dtype=float)
    y = _ortho(z)
    x = np.cross(y, z)
    return np.stack([x, y, z], axis=1)


def to_frame(m: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Coordinates of p in the orthonormal basis m (point.rs:254-257)."""
    return m.T @ np.asarray(p, dtype=float)


def from_frame(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Inverse of to_frame: m @ q (point.rs:246-249)."""
    return m @ np.asarray(q, dtype=float)


def planar_centroid(points: np.ndarray) -> np.ndarray:
    """Euclidean average of the points, normalized to the unit sphere
    (point.rs planar_centroid semantics)."""
    c = np.asarray(points, dtype=float).mean(axis=0)
    n = np.linalg.norm(c)
    return c / n if n > 0 else c


def _vec_angle(a: np.ndarray, b: np.ndarray) -> float:
    """Angle between unit vectors, stable near 0 and pi."""
    return math.atan2(float(np.linalg.norm(np.cross(a, b))), float(a @ b))


def triangle_signed_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Signed area of spherical triangle (a,b,c): positive iff CCW.

    Van Oosterom-Strackee: tan(area/2) = det / (1 + ab + bc + ca) with the
    RAW dot products and atan2, valid over the full (-2*pi, 2*pi) solid
    angle range.  The reference (loop.rs:1986-2012) takes |ab|+|bc|+|ca|
    and plain atan — a transcription bug that wraps triangles larger than
    a half-hemisphere to the wrong branch (empirically: the candy_cane fan
    sums to -0.08 instead of 1.59); this port uses the canonical formula.
    """
    a_dot_b = min(max(float(a @ b), -1.0), 1.0)
    b_dot_c = min(max(float(b @ c), -1.0), 1.0)
    c_dot_a = min(max(float(c @ a), -1.0), 1.0)
    det = float(a @ np.cross(b, c))
    return 2.0 * math.atan2(det, 1.0 + a_dot_b + b_dot_c + c_dot_a)


def triangle_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Unsigned area of spherical triangle (a,b,c): l'Huilier with a Girard
    fallback for skinny triangles (point.rs:318-351)."""
    sa = _vec_angle(b, c)
    sb = _vec_angle(c, a)
    sc = _vec_angle(a, b)
    s = 0.5 * (sa + sb + sc)
    if s >= 3e-4:
        dmin = s - max(sa, sb, sc)
        if dmin < 1e-2 * s * s * s * s * s:
            ab = np.cross(a, b)
            bc = np.cross(b, c)
            ac = np.cross(a, c)
            ab_ac = _vec_angle(ab, ac)
            ab_bc = _vec_angle(ab, bc)
            bc_ac = _vec_angle(bc, ac)
            area = max(ab_ac - ab_bc + bc_ac, 0.0)
            if dmin < s * 0.1 * area:
                return area
    return 4.0 * math.atan(
        math.sqrt(
            max(
                math.tan(0.5 * s)
                * math.tan(0.5 * (s - sa))
                * math.tan(0.5 * (s - sb))
                * math.tan(0.5 * (s - sc)),
                0.0,
            )
        )
    )


def triangle_true_centroid(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """True centroid of spherical triangle (a,b,c) times its signed area;
    not normalized (point.rs:353-400)."""
    sa = _vec_angle(b, c)
    ra = 1.0 if sa == 0.0 else sa / math.sin(sa)
    sb = _vec_angle(c, a)
    rb = 1.0 if sb == 0.0 else sb / math.sin(sb)
    sc = _vec_angle(a, b)
    rc = 1.0 if sc == 0.0 else sc / math.sin(sc)
    x = np.array([a[0], b[0] - a[0], c[0] - a[0]])
    y = np.array([a[1], b[1] - a[1], c[1] - a[1]])
    z = np.array([a[2], b[2] - a[2], c[2] - a[2]])
    r = np.array([ra, rb - ra, rc - ra])
    return 0.5 * np.array(
        [
            float(np.cross(y, z) @ r),
            float(np.cross(z, x) @ r),
            float(np.cross(x, y) @ r),
        ]
    )


def _ortho(v: np.ndarray) -> np.ndarray:
    """r3/vector.rs:249-261 — deterministic orthogonal vector."""
    ov = np.array([0.012, 0.0053, 0.00457])
    ax = np.argmax(np.abs(v))
    if ax == 0:
        ov[2] = 1.0
    elif ax == 1:
        ov[0] = 1.0
    else:
        ov[1] = 1.0
    w = np.cross(v, ov)
    return w / np.linalg.norm(w)


def ordered_ccw(a, b, c, o) -> bool:
    """B is between A and C going CCW around O (edge_crossings semantics).

    Canonical form: the first two tests admit Indeterminate (degenerate
    equal-point wedges), the third is strict — exactly one of the three can
    be degenerate-permissive without breaking transitivity.
    """
    total = 0
    if robust_sign(b, o, a) != CW:
        total += 1
    if robust_sign(c, o, b) != CW:
        total += 1
    if robust_sign(a, o, c) == CCW:
        total += 1
    return total >= 2


def vertex_crossing(a, b, c, d) -> bool:
    """Shared-vertex crossing parity (edge_crossings.rs:109-133)."""
    if np.array_equal(a, b) or np.array_equal(c, d):
        return False
    if np.array_equal(a, d):
        return ordered_ccw(_ortho(a), c, b, a)
    if np.array_equal(b, c):
        return ordered_ccw(_ortho(b), d, a, b)
    if np.array_equal(a, c):
        return ordered_ccw(_ortho(a), d, b, a)
    if np.array_equal(b, d):
        return ordered_ccw(_ortho(b), c, a, b)
    return False


def reference_dir(b: np.ndarray) -> np.ndarray:
    """Unit vector != b used as the vertex-ownership reference direction
    (point.rs:214-216: referenceDir = ortho)."""
    return _ortho(b)


def angle_contains_vertex(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> bool:
    """Does the angle ABC contain its vertex B (edge_crossings.rs:397-430)?

    Containment is defined so that when several polygons tile the region
    around a vertex, EXACTLY ONE of them contains that vertex — the rule
    that lets tiled polygons partition points with no gaps or double counts.
    The wedge is closed at A and open at C: for R = reference_dir(b),
    A == R -> True, C == R -> False, and the degenerate angle ABA -> False.

    Properties (pinned by tests):
      (1) angle_contains_vertex(a, b, a) == False
      (2) angle_contains_vertex(a, b, c) == not angle_contains_vertex(c, b, a)
          unless a == c
      (3) for v_1..v_k cyclically CCW around b,
          angle_contains_vertex(v_{i+1}, b, v_i) holds for exactly one i

    REQUIRES a != b and b != c.  Not sufficient for polygons with duplicate
    vertices (e.g. ABCADE) — those need the multi-edge ContainsVertexQuery
    accumulation.
    """
    return not ordered_ccw(reference_dir(b), c, a, b)


# ---------------------------------------------------------------------------
# EdgeCrosser (edge_crosser.rs:56-347, canonical semantics)
# ---------------------------------------------------------------------------


class EdgeCrosser:
    """Stateful AB-vs-chain crossing tester."""

    __slots__ = ("a", "b", "a_tangent", "b_tangent", "c", "acb")

    def __init__(self, a: np.ndarray, b: np.ndarray):
        self.a = a
        self.b = b
        norm = np.cross(a + b, b - a)  # robust 2*(a x b)
        self.a_tangent = np.cross(a, norm)
        self.b_tangent = np.cross(norm, b)
        self.c = None
        self.acb = INDETERMINATE

    def restart_at(self, c: np.ndarray) -> None:
        self.c = c
        self.acb = -triage_sign(self.a, self.b, c)

    def chain_crossing_sign(self, d: np.ndarray) -> int:
        bda = triage_sign(self.a, self.b, d)
        if self.acb == -bda and bda != INDETERMINATE:
            self.c = d
            self.acb = -bda
            return DO_NOT_CROSS
        return self._crossing_sign(d, bda)

    def crossing_sign(self, c: np.ndarray, d: np.ndarray) -> int:
        if self.c is None or not np.array_equal(c, self.c):
            self.restart_at(c)
        return self.chain_crossing_sign(d)

    def _crossing_sign(self, d: np.ndarray, bda: int) -> int:
        # edge_crosser.rs:166-347 (canonical semantics; the reference's
        # zero-vector special cases at :193-268 are off-test-path hacks).
        try:
            max_err = (1.5 + 1 / math.sqrt(3)) * DBL_EPSILON
            if (
                float(self.c @ self.a_tangent) > max_err
                and float(d @ self.a_tangent) > max_err
            ) or (
                float(self.c @ self.b_tangent) > max_err
                and float(d @ self.b_tangent) > max_err
            ):
                return DO_NOT_CROSS
            if (
                np.array_equal(self.a, self.c)
                or np.array_equal(self.a, d)
                or np.array_equal(self.b, self.c)
                or np.array_equal(self.b, d)
            ):
                return MAYBE_CROSS
            if np.array_equal(self.a, self.b) or np.array_equal(self.c, d):
                return DO_NOT_CROSS
            if self.acb == INDETERMINATE:
                self.acb = -expensive_sign(self.a, self.b, self.c)
            if bda == INDETERMINATE:
                bda = expensive_sign(self.a, self.b, d)
            if bda != self.acb:
                return DO_NOT_CROSS
            cbd = -robust_sign(self.c, d, self.b)
            if cbd != bda:
                return DO_NOT_CROSS
            dac = robust_sign(self.c, d, self.a)
            if dac != bda:
                return DO_NOT_CROSS
            return CROSS
        finally:
            self.c = d
            self.acb = -bda

    def edge_or_vertex_chain_crossing(self, d: np.ndarray) -> bool:
        c = self.c
        res = self.chain_crossing_sign(d)
        if res == CROSS:
            return True
        if res == DO_NOT_CROSS:
            return False
        return vertex_crossing(self.a, self.b, c, d)


def edge_or_vertex_crossing(a, b, c, d) -> bool:
    """edge_crossings.rs:140-146."""
    ec = EdgeCrosser(a, b)
    ec.restart_at(c)
    return ec.edge_or_vertex_chain_crossing(d)


# ---------------------------------------------------------------------------
# RectBounder (rect_bounder.rs:60-330)
# ---------------------------------------------------------------------------

_Z_AXIS = np.array([0.0, 0.0, 1.0])


class RectBounder:
    def __init__(self):
        self.a = None
        self.a_ll = None
        self.bound = Rect.empty()

    @staticmethod
    def _latlng(p) -> tuple[float, float]:
        return (math.atan2(p[2], math.hypot(p[0], p[1])), math.atan2(p[1], p[0]))

    def add_point(self, b: np.ndarray) -> None:
        b_lat, b_lng = self._latlng(b)
        if self.a is None:
            # first point: bound = point rect
            self.bound = Rect(RInterval(b_lat, b_lat), SInterval(b_lng, b_lng))
            self.a, self.a_ll = b, (b_lat, b_lng)
            return

        a = self.a
        n = np.cross(a - b, a + b)  # 2 * (A x B)
        n_norm = float(np.linalg.norm(n))
        if n_norm < 1.91346e-15:
            if float(a @ b) < 0:
                self.bound = Rect(RInterval(-PI / 2, PI / 2), SInterval.full())
            else:
                pair = Rect(
                    RInterval(min(self.a_ll[0], b_lat), max(self.a_ll[0], b_lat)),
                    SInterval.from_point_pair(self.a_ll[1], b_lng),
                )
                self.bound = _rect_union(self.bound, pair)
        else:
            lng_ab = SInterval.from_point_pair(self.a_ll[1], b_lng)
            if lng_ab.length >= PI - 2 * DBL_EPSILON:
                lng_ab = SInterval.full()
            lat_lo, lat_hi = sorted((self.a_ll[0], b_lat))
            lat_ab = RInterval(lat_lo, lat_hi)

            m = np.cross(n, _Z_AXIS)
            m_a = float(m @ a)
            m_b = float(m @ b)
            m_error = 6.06638e-16 * n_norm + 6.83174e-31
            if m_a * m_b < 0 or abs(m_a) <= m_error or abs(m_b) <= m_error:
                max_lat = min(
                    math.atan2(math.hypot(n[0], n[1]), abs(n[2])) + 3 * DBL_EPSILON,
                    PI / 2,
                )
                lat_budget_z = 0.5 * float(np.linalg.norm(a - b)) * math.sin(max_lat)
                lat_budget = 2 * math.asin(min((1 + 4 * DBL_EPSILON) * lat_budget_z, 1.0))
                max_delta = 0.5 * (lat_budget - lat_ab.length) + DBL_EPSILON
                hi, lo = lat_ab.hi, lat_ab.lo
                if m_a <= m_error and m_b >= -m_error:
                    hi = min(max_lat, lat_ab.hi + max_delta)
                if m_b <= m_error and m_a >= -m_error:
                    lo = max(-max_lat, lat_ab.lo - max_delta)
                lat_ab = RInterval(lo, hi)
            self.bound = _rect_union(self.bound, Rect(lat_ab, lng_ab))
        self.a, self.a_ll = b, (b_lat, b_lng)

    def get_bound(self) -> Rect:
        return self.bound.expanded(2 * DBL_EPSILON, 0.0).polar_closure()


def _s_union(i: SInterval, o: SInterval) -> SInterval:
    """s1 interval union (s1/interval.rs semantics)."""
    if o.is_empty:
        return i
    if i.is_empty:
        return o
    if i._fast_contains(o.lo):
        if i._fast_contains(o.hi):
            if i.contains_interval(o):
                return i
            return SInterval.full()
        return SInterval(i.lo, o.hi)
    if i._fast_contains(o.hi):
        return SInterval(o.lo, i.hi)
    if i.is_empty or o._fast_contains(i.lo):
        return o
    if _positive_dist(o.hi, i.lo) < _positive_dist(i.hi, o.lo):
        return SInterval(o.lo, i.hi)
    return SInterval(i.lo, o.hi)


def _positive_dist(a: float, b: float) -> float:
    d = b - a
    return d if d >= 0 else (b + PI) - (a - PI)


def _rect_union(r: Rect, o: Rect) -> Rect:
    if r.is_empty:
        return o
    if o.is_empty:
        return r
    lat = RInterval(min(r.lat.lo, o.lat.lo), max(r.lat.hi, o.lat.hi))
    return Rect(lat, _s_union(r.lng, o.lng))


def expand_for_subregions(bound: Rect) -> Rect:
    """rect_bounder.rs:267-330."""
    if bound.is_empty:
        return bound
    lat_gap = min(-PI / 2 - bound.lat.lo, bound.lat.hi - PI / 2, 0.0)
    lat_gap = min(PI / 2 + bound.lat.lo, PI / 2 - bound.lat.hi)
    min_abs_lat = max(bound.lat.lo, -bound.lat.hi)
    lat_expansion = 9 * DBL_EPSILON
    lng_expansion = 0.0
    if min_abs_lat >= 0:
        lng_expansion = PI if lat_gap <= 2.66e-15 else 2.66e-15 / lat_gap
    out = bound.expanded(lat_expansion, lng_expansion).polar_closure()
    # clamp latitudes
    return Rect(out.lat.intersection(RInterval(-PI / 2, PI / 2)), out.lng)


# ---------------------------------------------------------------------------
# Loop (loop.rs:105-445) + Polygon (polygon.rs:786-810)
# ---------------------------------------------------------------------------


class Loop:
    """Single CCW vertex ring (interior on the left).

    ``vertices``: (n,3) unit vectors.  Precomputes ``origin_inside`` and
    ``bound``/``subregion_bound`` exactly as loop.rs:273-378.
    """

    def __init__(self, vertices: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=float)
        n = len(self.vertices)
        self.depth = 0  # nesting depth within a Polygon (shells even, holes odd)
        self.is_empty_or_full = n == 1
        if self.is_empty_or_full:
            self.origin_inside = self.vertices[0][2] > 0  # full loop sentinel z=+1
            self.bound = Loop._sentinel_bound(self.origin_inside)
            self.subregion_bound = self.bound
            return
        self._init_origin()
        self._init_bound()

    @staticmethod
    def _sentinel_bound(origin_inside: bool) -> Rect:
        """Bound of the empty/full sentinel loops — shared with the binary
        decoder (kernel/serde.py), which must rebuild it when the stored
        origin flag overrides the recomputed one."""
        if origin_inside:
            return Rect(RInterval(-PI / 2, PI / 2), SInterval.full())
        return Rect.empty()

    @staticmethod
    def from_latlng_text(text: str) -> "Loop":
        """Parse the reference's "lat:lng, lat:lng, ..." fixture format
        (loop.rs:2046-2067)."""
        pts = []
        for part in text.split(","):
            lat_s, lng_s = part.strip().split(":")
            pts.append(_latlng_point(math.radians(float(lat_s)), math.radians(float(lng_s))))
        return Loop(np.array(pts))

    @staticmethod
    def empty() -> "Loop":
        return Loop(np.array([[0.0, 0.0, -1.0]]))

    @staticmethod
    def full() -> "Loop":
        return Loop(np.array([[0.0, 0.0, 1.0]]))

    def vertex(self, i: int) -> np.ndarray:
        return self.vertices[i % len(self.vertices)]

    def _init_origin(self) -> None:
        # loop.rs:273-319: v1 containment via ordered_ccw around vertex 1,
        # then compare with a brute-force test assuming origin_inside=False.
        v1_inside = ordered_ccw(
            _ortho(self.vertex(1)), self.vertex(0), self.vertex(2), self.vertex(1)
        )
        self.origin_inside = False
        if v1_inside != self.brute_force_contains_point(self.vertex(1)):
            self.origin_inside = True

    def _init_bound(self) -> None:
        # loop.rs:322-378
        bounder = RectBounder()
        for i in range(len(self.vertices) + 1):
            bounder.add_point(self.vertex(i))
        b = bounder.get_bound()
        # Pole containment via brute force (bound not yet available, loop.rs:340-350).
        if self.brute_force_contains_point(np.array([0.0, 0.0, 1.0])):
            b = Rect(RInterval(b.lat.lo, PI / 2), SInterval.full())
        if b.lng.is_full and self.brute_force_contains_point(np.array([0.0, 0.0, -1.0])):
            b = Rect(RInterval(-PI / 2, b.lat.hi), b.lng)
        self.bound = b
        self.subregion_bound = expand_for_subregions(b)

    # -- containment --

    def brute_force_contains_point(self, p: np.ndarray) -> bool:
        """Origin-anchored crossing parity (loop.rs:436-445)."""
        crosser = EdgeCrosser(ORIGIN, p)
        crosser.restart_at(self.vertex(0))
        inside = self.origin_inside
        for i in range(1, len(self.vertices) + 1):
            inside ^= crosser.edge_or_vertex_chain_crossing(self.vertex(i))
        return inside

    def contains_point(self, p: np.ndarray) -> bool:
        if self.is_empty_or_full:
            return self.origin_inside
        if not self.bound.contains_point(p):
            return False
        return self.brute_force_contains_point(p)

    def contains_points(self, px, py, pz) -> np.ndarray:
        """Vectorized crossing parity for batches of points (the Spark hot
        path; all edges x all points as einsums, staged-masked fallback for
        near-degenerate dets)."""
        px = np.asarray(px, dtype=float)
        m = len(px)
        if self.is_empty_or_full:
            return np.full(m, bool(self.origin_inside))
        P = np.stack([px, np.asarray(py, float), np.asarray(pz, float)], axis=1)
        n = len(self.vertices)
        C = self.vertices  # edge starts
        D = self.vertices[np.arange(1, n + 1) % n]  # edge ends

        A = ORIGIN
        # (3, m) column layout, C-contiguous: OpenBLAS's dgemm on a strided
        # right operand (P.T is a view) falls off the fast kernel and runs
        # ~8x slower for these (n_edges, 3) @ (3, m) shapes — measured 414ms
        # vs 34ms at n=512, m=5000.  One explicit copy fixes every det below.
        Pt = np.ascontiguousarray(P.T)
        # det(A, P_j, X_i) = (X_i x A) . P_j   -> shape (n, m)
        CxA = np.cross(C, A)
        DxA = np.cross(D, A)
        s_c = CxA @ Pt  # sign(A,B,C) dets
        s_d = DxA @ Pt
        CxD = np.cross(C, D)
        s_a = CxD @ A  # det(C,D,A), shape (n,)
        s_b = CxD @ Pt  # det(C,D,B), shape (n,m)

        eps = MAX_DETERMINANT_ERROR
        certain = (
            (np.abs(s_c) > eps)
            & (np.abs(s_d) > eps)
            & (np.abs(s_a)[:, None] > eps)
            & (np.abs(s_b) > eps)
        )
        # simple 4-triangle crossing: C/D on opposite sides of plane(A,B) and
        # A/B on opposite sides of plane(C,D)
        crossing = (
            (np.sign(s_c) != np.sign(s_d))
            & (np.sign(s_a)[:, None] != np.sign(s_b))
            & (np.sign(s_c) == np.sign(s_b))
        )
        parity = np.bitwise_xor.reduce(np.where(certain, crossing, False), axis=0)
        inside = parity ^ self.origin_inside

        # Rows where every det is decisive have an exact parity, and by the
        # RectBounder guarantee (rect_bounder.rs:50-59) any genuinely-contained
        # point also passes the bound prefilter — so no bound check is needed
        # on the fast path.  Rows with any uncertain det fall back to the full
        # scalar contains_point (bound prefilter + robust crossing chain,
        # loop.rs:408-445), keeping vec ≡ scalar bit-for-bit.
        bad = ~certain.all(axis=0)
        if np.any(bad):
            for j in np.nonzero(bad)[0]:
                inside[j] = self.contains_point(P[j])
        return inside

    # -- area / curvature (loop.rs:1833-1980) --

    def turning_angle(self) -> float:
        n = len(self.vertices)
        if n < 3:
            return 2 * PI if self.origin_inside else -2 * PI
        total = 0.0
        for i in range(n):
            a, b, c = self.vertex(i), self.vertex(i + 1), self.vertex(i + 2)
            ang = _turn_angle(a, b, c)
            total += ang
        return total

    def signed_area(self) -> float:
        """Girard-style: area = 2*pi - turning_angle for a CCW loop."""
        return 2 * PI - self.turning_angle()

    def is_empty(self) -> bool:
        return self.is_empty_or_full and not self.origin_inside

    def is_full(self) -> bool:
        return self.is_empty_or_full and self.origin_inside

    def contains_origin(self) -> bool:
        return self.origin_inside

    def is_hole(self) -> bool:
        return (self.depth & 1) == 1

    def sign(self) -> int:
        """-1 for holes, +1 for shells (loop.rs)."""
        return -1 if self.is_hole() else 1

    def turning_angle_max_error(self) -> float:
        """~11.25 * DBL_EPSILON per vertex (loop.rs:1803-1814)."""
        return 11.25 * DBL_EPSILON * len(self.vertices)

    def find_vertex(self, p: np.ndarray) -> int | None:
        """Index m in [1, n] with vertex(m) == p, else None (loop.rs:708-717)."""
        n = len(self.vertices)
        for m in range(1, n + 1):
            if np.array_equal(self.vertex(m), p):
                return m
        return None

    def contains_non_crossing_boundary(self, other: "Loop", reverse_other: bool) -> bool:
        """Whether this loop contains other's boundary, given that their
        boundaries do not cross (loop.rs:157-188)."""
        if not self.bound.intersects_rect(other.bound):
            return False
        if self.is_full():
            return True
        if other.is_full():
            return False
        m = self.find_vertex(other.vertex(0))
        if m is None:
            return self.contains_point(other.vertex(0))
        return wedge_contains_semi_wedge(
            self.vertex(m - 1),
            self.vertex(m),
            self.vertex(m + 1),
            other.vertex(1),
            reverse_other,
        )

    def find_validation_error(self) -> str | None:
        """Input validation for untrusted loops (loop.rs:1318-1362, the
        no-index part), plus the non-adjacent-edge-crossing sweep the
        reference defers to its ShapeIndex.  Returns None when valid."""
        for i, v in enumerate(self.vertices):
            if abs(float(v @ v) - 1.0) > 5e-14:
                return f"vertex {i} is not unit length"
        n = len(self.vertices)
        if n < 3:
            if self.is_empty_or_full:
                return None
            return "non-empty, non-full loops must have at least 3 vertices"
        for i in range(n):
            if np.array_equal(self.vertex(i), self.vertex(i + 1)):
                return f"edge {i} is degenerate (duplicate vertex)"
            if np.array_equal(self.vertex(i), -self.vertex(i + 1)):
                return f"vertices {i} and {(i + 1) % n} are antipodal"
        # Self-intersection: any two non-adjacent edges must not cross or
        # share a vertex (the reference runs this via findSelfIntersection).
        for i in range(n):
            a0, a1 = self.vertex(i), self.vertex(i + 1)
            crosser = EdgeCrosser(a0, a1)
            for j in range(i + 1, n):
                b0, b1 = self.vertex(j), self.vertex(j + 1)
                adjacent = j == i + 1 or (i == 0 and j == n - 1)
                c = crosser.crossing_sign(b0, b1)
                if c == CROSS:
                    return f"edges {i} and {j} cross"
                if c == MAYBE_CROSS and not adjacent:
                    return f"edges {i} and {j} share a vertex"
        return None

    def surface_integral(self, f, vec: bool = False):
        """Oriented surface integral of f over the loop interior via a
        triangle fan with numerically-stable origin shifts
        (loop.rs:1870-1925)."""
        max_length = PI - 1e-5
        total = np.zeros(3) if vec else 0.0
        v0 = self.vertex(0)
        origin = v0
        n = len(self.vertices)
        for i in range(1, n - 1):
            if _vec_angle(self.vertex(i + 1), origin) > max_length:
                old_origin = origin
                if np.array_equal(origin, v0):
                    c = np.cross(v0, self.vertex(i))
                    origin = c / np.linalg.norm(c)
                elif _vec_angle(self.vertex(i), v0) < max_length:
                    origin = v0
                else:
                    origin = np.cross(v0, old_origin)
                    total = total + f(v0, old_origin, origin)
                total = total + f(old_origin, self.vertex(i), origin)
            total = total + f(origin, self.vertex(i), self.vertex(i + 1))
        if not np.array_equal(origin, v0):
            total = total + f(origin, self.vertex(n - 1), v0)
        return total

    def area(self) -> float:
        """Robust interior area in [0, 4*pi] (loop.rs:1833-1867): signed
        triangle-fan sum, wrap negatives (loop exterior), disambiguate
        near-0/near-4pi via explicit orientation."""
        if self.is_empty_or_full:
            return 4.0 * PI if self.origin_inside else 0.0
        area = self.surface_integral(triangle_signed_area)
        # The fan integral equals the signed area only mod 4*pi: each fan
        # triangle's signed area is computed on its principal (<= 2*pi)
        # sheet, so a large non-convex loop can wind the sum one sheet high
        # (observed: a simple 60-vertex grid boundary ring with true area
        # 4.877 integrating to 17.443 = area + 4*pi, where Gauss-Bonnet
        # 2*pi - turning_angle certifies the true value).  loop.rs:1848-1852
        # only wraps NEGATIVE sums and its clamp+orientation branch then
        # aliases such loops to area 0 — a reference defect; fmod is the
        # identity on (-4*pi, 4*pi), so all reference-reachable behavior is
        # preserved.
        area = math.fmod(area, 4.0 * PI)
        if area < 0.0:
            area += 4.0 * PI
        area = min(max(area, 0.0), 4.0 * PI)
        max_error = self.turning_angle_max_error()
        if area < max_error and not self.is_normalized():
            return 4.0 * PI
        if area > 4.0 * PI - max_error and self.is_normalized():
            return 0.0
        return area

    def centroid(self) -> np.ndarray:
        """True centroid multiplied by loop area; not unit length
        (loop.rs:1930-1940).  Pre-scaling by area makes centroids of
        disjoint regions additive."""
        if self.is_empty_or_full:
            return np.zeros(3)
        return self.surface_integral(triangle_true_centroid, vec=True)

    def is_normalized(self) -> bool:
        """Area at most 2*pi (loop.rs:1660-1676)."""
        if self.bound.lng.length < PI:
            return True
        # hemispheres evaluate turning_angle to exactly -2*pi with no error;
        # allow the reference's canonical error bound
        return self.turning_angle() >= -self.turning_angle_max_error()

    def invert(self) -> "Loop":
        """Complement region: reversed vertex order (loop.rs:1684-1716)."""
        if len(self.vertices) == 1:
            return Loop.empty() if self.origin_inside else Loop.full()
        return Loop(self.vertices[::-1].copy())

    def normalize(self) -> "Loop":
        """Self, or the inverse, whichever encloses at most 2*pi."""
        return self if self.is_normalized() else self.invert()

    def canonical_first_vertex(self) -> tuple[int, int]:
        """(first_index, direction) giving the canonical rotation/orientation
        (loop.rs:1724-1741): lexicographically smallest edge comes first,
        forward. Returns (i, 1) or (i + n, -1)."""
        n = len(self.vertices)
        first = 0
        for i in range(n):
            if tuple(self.vertices[i]) < tuple(self.vertices[first]):
                first = i
        if tuple(self.vertices[(first + 1) % n]) < tuple(self.vertices[(first - 1) % n]):
            return first, 1
        return first + n, -1

    # -- Region interface for the coverer --

    def cap_bound(self) -> Cap:
        return self.bound.cap_bound()

    def rect_bound(self) -> Rect:
        return self.bound

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()

    # Loops with at least this many vertices get a per-face edge index for
    # cell relations: the exact EdgeCrosser sweep is O(n_edges) per candidate
    # cell, which makes covering generation crawl on coastline-sized loops
    # (the gap SURVEY §2.13 noted when ShapeIndex was replaced).
    _FACE_INDEX_THRESHOLD = 64
    # uv-grid resolution of the per-face bucket index (16x16 over [-1,1]^2)
    _FACE_GRID_K = 16

    def _face_index(self):
        """Per-face 2D edge index (lazy): gnomonic projection maps loop
        edges to straight uv segments per face (kernel/clipping.py
        face_segments), so edge-vs-cell tests become 2D segment-vs-rect
        tests against numpy bbox arrays instead of EdgeCrosser sweeps."""
        idx = getattr(self, "_face_index_cache", None)
        if idx is not None:
            return idx
        from .clipping import face_segments
        from . import stuv as _stuv

        segs: dict[int, list] = {f: [] for f in range(6)}
        n = len(self.vertices)
        for i in range(n):
            for f, sa, sb in face_segments(self.vertex(i), self.vertex(i + 1)):
                segs[f].append((sa[0], sa[1], sb[0], sb[1]))
        vx = self.vertices
        vf = np.asarray(_stuv.face(vx[:, 0], vx[:, 1], vx[:, 2]))
        vu, vv = _stuv.valid_face_xyz_to_uv(vf, vx[:, 0], vx[:, 1], vx[:, 2])
        idx = {}
        K = self._FACE_GRID_K
        for f in range(6):
            arr = np.asarray(segs[f], dtype=np.float64).reshape(-1, 4)
            bbox = np.stack(
                [
                    np.minimum(arr[:, 0], arr[:, 2]),
                    np.maximum(arr[:, 0], arr[:, 2]),
                    np.minimum(arr[:, 1], arr[:, 3]),
                    np.maximum(arr[:, 1], arr[:, 3]),
                ],
                axis=1,
            ) if len(arr) else np.zeros((0, 4))
            # uv-grid buckets (KxK over [-1,1]^2): a cell test gathers only
            # the buckets its rect overlaps instead of bbox-scanning every
            # segment of the face — O(nearby) per cell, not O(n_edges)
            grid: dict[tuple[int, int], list[int]] = {}
            for si in range(len(arr)):
                gi0, gi1 = _grid_span(bbox[si, 0], bbox[si, 1], K)
                gj0, gj1 = _grid_span(bbox[si, 2], bbox[si, 3], K)
                for gi in range(gi0, gi1 + 1):
                    for gj in range(gj0, gj1 + 1):
                        grid.setdefault((gi, gj), []).append(si)
            grid_np = {k: np.asarray(v, dtype=np.int64) for k, v in grid.items()}
            m = vf == f
            idx[f] = (
                arr,
                bbox,
                np.stack([vu[m], vv[m]], axis=1) if m.any() else np.zeros((0, 2)),
                grid_np,
            )
        self._face_index_cache = idx
        return idx

    def _edges_cross_cell_indexed(self, cell) -> bool:
        """2D segment-vs-rect sweep over the face index: gather the uv-grid
        buckets the cell rect overlaps, bbox-filter those candidates, then
        exact Cyrus-Beck segment-vs-rect (kernel/clipping.py).  The rect is
        expanded by eps, making the answer conservative toward 'crossing' —
        safe in both covering uses (intersects_cell over-keeps candidates,
        contains_cell under-claims interiors)."""
        from .clipping import edge_intersects_rect

        eps = 1e-12
        arr, bbox, _, grid = self._face_index()[cell.face]
        if not len(arr):
            return False
        u_lo, u_hi = cell.u_lo - eps, cell.u_hi + eps
        v_lo, v_hi = cell.v_lo - eps, cell.v_hi + eps
        K = self._FACE_GRID_K
        gi0, gi1 = _grid_span(u_lo, u_hi, K)
        gj0, gj1 = _grid_span(v_lo, v_hi, K)
        chunks = [
            grid.get((gi, gj))
            for gi in range(gi0, gi1 + 1)
            for gj in range(gj0, gj1 + 1)
        ]
        chunks = [c for c in chunks if c is not None]
        if not chunks:
            return False
        cand = np.unique(np.concatenate(chunks)) if len(chunks) > 1 else chunks[0]
        bb = bbox[cand]
        m = (
            (bb[:, 1] >= u_lo)
            & (bb[:, 0] <= u_hi)
            & (bb[:, 3] >= v_lo)
            & (bb[:, 2] <= v_hi)
        )
        rect = (u_lo, u_hi, v_lo, v_hi)
        for ax, ay, bx, by in arr[cand[m]]:
            if edge_intersects_rect((ax, ay), (bx, by), rect):
                return True
        return False

    def _vertex_in_cell_indexed(self, cell) -> bool:
        eps = 1e-12
        _, _, verts, _ = self._face_index()[cell.face]
        if not len(verts):
            return False
        return bool(
            (
                (verts[:, 0] >= cell.u_lo - eps)
                & (verts[:, 0] <= cell.u_hi + eps)
                & (verts[:, 1] >= cell.v_lo - eps)
                & (verts[:, 1] <= cell.v_hi + eps)
            ).any()
        )

    def _edges_cross_cell(self, cell) -> bool:
        if len(self.vertices) >= self._FACE_INDEX_THRESHOLD:
            return self._edges_cross_cell_indexed(cell)
        cv = cell.vertices()
        n = len(self.vertices)
        for k in range(4):
            crosser = EdgeCrosser(cv[k], cv[(k + 1) & 3])
            crosser.restart_at(self.vertex(0))
            for i in range(1, n + 1):
                if crosser.chain_crossing_sign(self.vertex(i)) >= 0:  # Cross or Maybe
                    return True
        return False

    def _any_vertex_in_cell(self, cell) -> bool:
        if len(self.vertices) >= self._FACE_INDEX_THRESHOLD:
            return self._vertex_in_cell_indexed(cell)
        return any(cell.contains_point(v) for v in self.vertices)

    def intersects_cell(self, cell) -> bool:
        if not self.bound.intersects_rect(cell.rect_bound()):
            return False
        cv = cell.vertices()
        if self.contains_points(
            np.array([v[0] for v in cv]),
            np.array([v[1] for v in cv]),
            np.array([v[2] for v in cv]),
        ).any():
            return True
        if self._any_vertex_in_cell(cell):
            return True
        return self._edges_cross_cell(cell)

    def contains_cell(self, cell) -> bool:
        if not self.bound.contains_rect(cell.rect_bound()):
            # cheap reject; bound containment is necessary for cell containment
            if not self.bound.intersects_rect(cell.rect_bound()):
                return False
        cv = cell.vertices()
        if not self.contains_points(
            np.array([v[0] for v in cv]),
            np.array([v[1] for v in cv]),
            np.array([v[2] for v in cv]),
        ).all():
            return False
        if self._any_vertex_in_cell(cell):
            return False
        return not self._edges_cross_cell(cell)


def _grid_span(lo: float, hi: float, k: int) -> tuple[int, int]:
    """Bucket index range [g0, g1] covering [lo, hi] on a k-bucket grid over
    [-1, 1] (clamped; uv coordinates from padded-face clipping may poke
    slightly outside)."""
    g0 = int((lo + 1.0) * 0.5 * k)
    g1 = int((hi + 1.0) * 0.5 * k)
    return max(0, min(g0, k - 1)), max(0, min(g1, k - 1))


def _turn_angle(a, b, c) -> float:
    """Signed turning angle at b (loop.rs:1794-1828 semantics)."""
    ab = np.cross(a, b)
    bc = np.cross(b, c)
    na = float(np.linalg.norm(ab))
    nb = float(np.linalg.norm(bc))
    if na == 0 or nb == 0:
        return 0.0
    angle = math.atan2(float(np.cross(ab, bc) @ b), float(ab @ bc))
    return angle


def loop_contains_nested(a: "Loop", b: "Loop") -> bool:
    """A.contains_nested(B): containment given no shared edges and either
    nesting or disjointness (loop.rs:671-700).  Used to build the polygon
    loop hierarchy."""
    if not a.subregion_bound.contains_rect(b.bound):
        return False
    if a.is_empty_or_full or len(b.vertices) < 2:
        return a.is_full() or b.is_empty()
    m = a.find_vertex(b.vertex(1))
    if m is None:
        return a.contains_point(b.vertex(1))
    return general_wedge_contains(
        a.vertex(m - 1), a.vertex(m), a.vertex(m + 1), b.vertex(0), b.vertex(2)
    )


def _order_nested(loops: list["Loop"]) -> list["Loop"]:
    """Assign depths and return loops in preorder of the nesting forest
    (polygon.rs:218-346 init_nested/build_loop_hierarchy semantics).

    Loops are shallow-cloned before the depth assignment so constructing a
    Polygon never mutates caller-owned Loop objects (vertices and the
    precomputed bounds stay shared)."""
    import copy as _copy

    loops = [_copy.copy(lp) for lp in loops]
    n = len(loops)
    if n <= 1:
        for lp in loops:
            lp.depth = 0
        return list(loops)
    containers = [
        [j for j in range(n) if j != i and loop_contains_nested(loops[j], loops[i])]
        for i in range(n)
    ]
    parent = [None] * n
    for i in range(n):
        best = None
        for j in containers[i]:
            if best is None or loop_contains_nested(loops[best], loops[j]):
                best = j
        parent[i] = best
    children: dict[int | None, list[int]] = {None: []}
    for i in range(n):
        children.setdefault(i, [])
    for i in range(n):
        children.setdefault(parent[i], []).append(i)
    ordered: list[Loop] = []

    def visit(idx: int, depth: int) -> None:
        loops[idx].depth = depth
        ordered.append(loops[idx])
        for c in children.get(idx, []):
            visit(c, depth + 1)

    for r in children[None]:
        visit(r, 0)
    if len(ordered) != n:
        # a containment cycle (every loop claims a parent) silently orphaning
        # loops would corrupt parity semantics — fail loudly instead.  Valid
        # non-crossing loop sets cannot cycle; this fires on malformed input
        # (e.g. self-touching loops with duplicate vertices).
        raise ValueError(
            f"polygon nesting failed: {n - len(ordered)} of {n} loops in a "
            "containment cycle (malformed or self-touching input loops?)"
        )
    return ordered


class Polygon:
    """Nested loop hierarchy (polygon.rs:140-377): the interior consists of
    points contained by an odd number of loops.  Loops are stored in
    preorder of the nesting forest with ``depth`` set (shells even depths,
    holes odd); ``parent``/``last_descendant`` navigate the hierarchy."""

    def __init__(self, loops: list[Loop], _nested: bool = False):
        self.loops = list(loops) if _nested else _order_nested(list(loops))
        self._init_properties()

    def _init_properties(self) -> None:
        self.has_holes = any(lp.is_hole() for lp in self.loops)
        b = Rect.empty()
        for lp in self.loops:
            if not lp.is_hole():
                b = _rect_union(b, lp.bound)
        self.bound = b
        self.subregion_bound = expand_for_subregions(b)

    @staticmethod
    def from_loops(loops: list[Loop]) -> "Polygon":
        """Nesting is inferred; loops reordered to preorder with depths
        (polygon.rs:149-161)."""
        if len(loops) == 1 and loops[0].is_empty():
            return Polygon([], _nested=True)
        return Polygon(loops)

    @staticmethod
    def from_oriented_loops(loops: list[Loop]) -> "Polygon":
        """Loops oriented with the polygon interior on their left; holes are
        auto-inverted (polygon.rs:169-211)."""
        norm = []
        for lp in loops:
            inverted = False
            angle = lp.turning_angle()
            if abs(angle) > lp.turning_angle_max_error():
                if angle < 0.0:
                    lp = lp.invert()
                    inverted = True
            else:
                if lp.contains_origin():
                    lp = lp.invert()
                    inverted = True
            # annotation survives Polygon's defensive loop cloning
            lp._oriented_was_inverted = inverted
            norm.append(lp)
        p = Polygon.from_loops(norm)
        if p.num_loops() > 0:
            origin_loop = p.loops[0]
            polygon_contains_origin = False
            for lp in p.loops:
                if lp.contains_origin():
                    polygon_contains_origin = not polygon_contains_origin
                    origin_loop = lp
            # the INPUT loop's origin containment = current, un-flipped
            want = origin_loop.contains_origin() != getattr(
                origin_loop, "_oriented_was_inverted", False
            )
            if want != polygon_contains_origin:
                p = p.invert()
        return p

    # -- hierarchy --

    def num_loops(self) -> int:
        return len(self.loops)

    def is_empty(self) -> bool:
        return not self.loops

    def is_full(self) -> bool:
        return len(self.loops) == 1 and self.loops[0].is_full()

    def parent(self, k: int) -> int | None:
        """Index of loop k's parent in the preorder (polygon.rs:537-559)."""
        depth = self.loops[k].depth
        if depth == 0:
            return None
        k -= 1
        while k >= 0 and self.loops[k].depth >= depth:
            k -= 1
        return None if k < 0 else k

    def last_descendant(self, k: int) -> int:
        """Index of the last loop nested within loop k (polygon.rs:561-583)."""
        if k >= len(self.loops):
            return len(self.loops) - 1
        depth = self.loops[k].depth
        k += 1
        while k < len(self.loops) and self.loops[k].depth > depth:
            k += 1
        return k - 1

    def invert(self) -> "Polygon":
        """Complement region (polygon.rs:454-533): invert the largest-area
        depth-0 loop; its former siblings become descendants and vice versa."""
        if self.is_empty():
            return Polygon([Loop.full()], _nested=True)
        if self.is_full():
            return Polygon([], _nested=True)
        best, best_angle = 0, None
        for i in range(1, len(self.loops)):
            if self.loops[i].depth != 0:
                continue
            if best_angle is None:
                best_angle = self.loops[best].turning_angle()
            angle = self.loops[i].turning_angle()
            if angle < best_angle:
                best, best_angle = i, angle
        import copy as _copy

        last_best = self.last_descendant(best)
        new_loops = [self.loops[best].invert()]
        new_loops[0].depth = 0
        # clone before re-depthing: self's loops must stay untouched
        for i, lp in enumerate(self.loops):
            if i < best or i > last_best:
                lp = _copy.copy(lp)
                lp.depth += 1
                new_loops.append(lp)
        for i, lp in enumerate(self.loops):
            if best < i <= last_best:
                lp = _copy.copy(lp)
                lp.depth -= 1
                new_loops.append(lp)
        return Polygon(new_loops, _nested=True)

    # -- point / area --

    def contains_point(self, p: np.ndarray) -> bool:
        inside = False
        for lp in self.loops:
            inside ^= lp.contains_point(p)
        return inside

    def contains_points(self, px, py, pz) -> np.ndarray:
        out = np.zeros(len(np.asarray(px)), dtype=bool)
        for lp in self.loops:
            out ^= lp.contains_points(px, py, pz)
        return out

    def rect_bound(self) -> Rect:
        return self.bound

    def area(self) -> float:
        """Interior area: sum of loop areas signed by depth parity
        (polygon.rs:1028-1038)."""
        return sum(lp.sign() * lp.area() for lp in self.loops)

    def centroid(self) -> np.ndarray:
        """True centroid times polygon area, not unit length
        (polygon.rs:1040-1062)."""
        u = np.zeros(3)
        for lp in self.loops:
            u = u + lp.sign() * lp.centroid()
        return u

    # -- validation --

    def validate(self) -> str | None:
        """Returns None when valid (polygon.rs:605-637 + nesting check)."""
        for i, lp in enumerate(self.loops):
            err = lp.find_validation_error()
            if err is not None:
                return f"loop {i}: {err}"
            if lp.is_empty():
                return f"loop {i}: empty loops are not allowed"
            if lp.is_full() and len(self.loops) > 1:
                return f"loop {i}: full loop appears in non-full polygon"
        return self._find_loop_nesting_error()

    def _find_loop_nesting_error(self) -> str | None:
        """polygon.rs:641-679."""
        last_depth = -1
        for i, lp in enumerate(self.loops):
            if lp.depth < 0 or lp.depth > last_depth + 1:
                return f"loop {i}: invalid loop depth ({lp.depth})"
            last_depth = lp.depth
        for i in range(len(self.loops)):
            last = self.last_descendant(i)
            for j in range(len(self.loops)):
                if i == j:
                    continue
                nested = i < j <= last
                if self.loops[i].contains_non_crossing_boundary(self.loops[j], False) != nested:
                    word = "" if nested else "not "
                    return f"invalid nesting: loop {i} should {word}contain loop {j}"
        return None

    # -- polygon-polygon relations (polygon.rs:1064-1231) --

    def _any_loop_contains(self, o: Loop) -> bool:
        return any(loop_contains_loop(lp, o) for lp in self.loops)

    def _any_loop_intersects(self, o: Loop) -> bool:
        return any(loop_intersects_loop(lp, o) for lp in self.loops)

    def compare_boundary(self, o: Loop) -> int:
        """+1 contains boundary of o, -1 excludes it, 0 boundaries cross
        (polygon.rs:1115-1132): sign flips per containing loop."""
        result = -1
        for lp in self.loops:
            if result == 0:
                break
            result *= -loop_compare_boundary(lp, o)
        return result

    def contains_boundary(self, o: "Polygon") -> bool:
        return all(self.compare_boundary(lp) > 0 for lp in o.loops)

    def excludes_boundary(self, o: "Polygon") -> bool:
        return all(self.compare_boundary(lp) < 0 for lp in o.loops)

    def _contains_non_crossing_boundary(self, o: Loop, reverse: bool) -> bool:
        inside = False
        for lp in self.loops:
            inside ^= lp.contains_non_crossing_boundary(o, reverse)
        return inside

    def excludes_non_crossing_shells(self, o: "Polygon") -> bool:
        for lp in o.loops:
            if lp.is_hole():
                continue
            if self._contains_non_crossing_boundary(lp, False):
                return False
        return True

    def excludes_non_crossing_complement_shells(self, o: "Polygon") -> bool:
        if o.is_empty():
            return not self.is_full()
        if o.is_full():
            return True
        for j, lp in enumerate(o.loops):
            if j > 0 and not lp.is_hole():
                continue
            if self._contains_non_crossing_boundary(lp, j == 0):
                return False
        return True

    def contains(self, o: "Polygon") -> bool:
        if len(self.loops) == 1 and len(o.loops) == 1:
            return loop_contains_loop(self.loops[0], o.loops[0])
        if not self.subregion_bound.contains_rect(o.bound):
            if not _sinterval_union_full(self.bound.lng, o.bound.lng):
                return False
        if not self.has_holes and not o.has_holes:
            return all(self._any_loop_contains(lp) for lp in o.loops)
        return self.contains_boundary(o) and o.excludes_non_crossing_complement_shells(
            self
        )

    def intersects(self, o: "Polygon") -> bool:
        if len(self.loops) == 1 and len(o.loops) == 1:
            return loop_intersects_loop(self.loops[0], o.loops[0])
        if not self.bound.intersects_rect(o.bound):
            return False
        if not self.has_holes and not o.has_holes:
            return any(self._any_loop_intersects(lp) for lp in o.loops)
        return not self.excludes_boundary(o) or not o.excludes_non_crossing_shells(self)

    # -- cell relations --

    def cell_union_bound(self) -> list[int]:
        return self.rect_bound().cell_union_bound()

    def intersects_cell(self, cell) -> bool:
        return any(lp.intersects_cell(cell) for lp in self.loops) or self.contains_point(
            cell.vertex(0)
        )

    def contains_cell(self, cell) -> bool:
        for k in range(4):
            if not self.contains_point(cell.vertex(k)):
                return False
        return not any(lp._edges_cross_cell(cell) for lp in self.loops) and not any(
            cell.contains_point(v) for lp in self.loops for v in lp.vertices
        )


# ---------------------------------------------------------------------------
# Loop-loop relations (loop.rs:512-611, 836-906, 978-1046) — driver-side ops
# ---------------------------------------------------------------------------


def general_wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """Wedge A=(a0,ab1,a2) contains wedge B=(b0,ab1,b2) (loop.rs:884-890)."""
    return ordered_ccw(a2, b2, b0, ab1) and ordered_ccw(b0, a0, a2, ab1)


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    """Wedges A0-AB1-A2 and B0-AB1-B2 intersect at shared center AB1.

    Canonical S2 semantics (the reference's version at loop.rs:855-882 is a
    self-described stand-in that reuses WedgeContains): for A NOT to
    intersect B the CCW edge order around ab1 must be a0 b2 b0 a2, written
    as negated OrderedCCW tests so shared/degenerate vertices resolve right.
    """
    return not (ordered_ccw(a0, b2, b0, ab1) and ordered_ccw(b0, a2, a0, ab1))


def _shared_vertex_scan(a: "Loop", b: "Loop", wedge_fn) -> tuple[bool, bool]:
    """(found_shared_vertex, relation_triggered) over all shared vertices."""
    found = False
    na, nb = len(a.vertices), len(b.vertices)
    for i in range(na):
        vi = a.vertices[i]
        for j in range(nb):
            if np.array_equal(vi, b.vertices[j]):
                found = True
                if wedge_fn(
                    a.vertices[(i - 1) % na],
                    vi,
                    a.vertices[(i + 1) % na],
                    b.vertices[(j - 1) % nb],
                    b.vertices[(j + 1) % nb],
                ):
                    return True, True
    return found, False


def _edges_cross(a: "Loop", b: "Loop") -> bool:
    """Any proper (interior) crossing between boundaries — O(n*m) EdgeCrosser
    sweep (replaces CrossingEdgeQuery for driver-side loop counts)."""
    na, nb = len(a.vertices), len(b.vertices)
    for i in range(na):
        crosser = EdgeCrosser(a.vertices[i], a.vertices[(i + 1) % na])
        crosser.restart_at(b.vertices[0])
        for j in range(nb):
            if crosser.chain_crossing_sign(b.vertices[(j + 1) % nb]) > 0:
                return True
    return False


def _rect_is_full(r) -> bool:
    # SInterval.is_full is a property, not a method: calling it returned a
    # bound method truthiness bug's cousin (TypeError) on the
    # union-bound-is-full branch — only reachable when two big loops cover
    # the sphere between them (found by fuzzing with 100-degree caps)
    return r.lat.lo == -np.pi / 2 and r.lat.hi == np.pi / 2 and r.lng.is_full


def loop_contains_loop(a: "Loop", b: "Loop") -> bool:
    """A.contains(B) — canonical semantics (loop.rs:512-567)."""
    if not a.subregion_bound.contains_rect(b.bound):
        return False
    if len(a.vertices) == 1 or len(b.vertices) == 1:
        a_full = len(a.vertices) == 1 and a.origin_inside
        b_empty = len(b.vertices) == 1 and not b.origin_inside
        return a_full or b_empty
    found_shared, crossed = _shared_vertex_scan(
        a, b, lambda a0, ab1, a2, b0, b2: not general_wedge_contains(a0, ab1, a2, b0, b2)
    )
    if crossed:
        return False
    # Edge-crossing sweep runs unconditionally (loop.rs:978 has_crossing_relation):
    # loops can share a vertex with non-crossing wedges there yet have properly
    # crossing edges elsewhere.
    if _edges_cross(a, b):
        return False
    if found_shared:
        return True
    if not a.contains_point(b.vertices[0]):
        return False
    # reject the union-is-entire-sphere case (loop.rs:558-563)
    union = _rect_union(b.bound, a.bound)
    if (b.subregion_bound.contains_rect(a.bound) or _rect_is_full(union)) and b.contains_point(
        a.vertices[0]
    ):
        return False
    return True


def loop_intersects_loop(a: "Loop", b: "Loop") -> bool:
    """A.intersects(B) — canonical semantics (loop.rs:569-611)."""
    if not a.bound.intersects_rect(b.bound):
        return False
    if len(a.vertices) == 1 or len(b.vertices) == 1:
        a_full = len(a.vertices) == 1 and a.origin_inside
        b_full = len(b.vertices) == 1 and b.origin_inside
        a_nonempty = not (len(a.vertices) == 1 and not a.origin_inside)
        b_nonempty = not (len(b.vertices) == 1 and not b.origin_inside)
        return (a_full and b_nonempty) or (b_full and a_nonempty)
    found_shared, crossed = _shared_vertex_scan(a, b, wedge_intersects)
    if crossed:
        return True
    # Unconditional sweep — see loop_contains_loop note (loop.rs:978).
    if _edges_cross(a, b):
        return True
    if found_shared:
        return False
    if (
        a.subregion_bound.contains_rect(b.bound) or _rect_is_full(_rect_union(a.bound, b.bound))
    ) and a.contains_point(b.vertices[0]):
        return True
    if b.subregion_bound.contains_rect(a.bound) and b.contains_point(a.vertices[0]):
        return True
    return False


def wedge_contains_semi_wedge(a0, ab1, a2, b2, reverse: bool) -> bool:
    """Wedge (a0,ab1,a2) contains the semiwedge just CCW of edge (ab1,b2)
    (loop.rs:896-906)."""
    if np.array_equal(b2, a0) or np.array_equal(b2, a2):
        return bool(np.array_equal(b2, a0)) == reverse
    return ordered_ccw(a0, a2, b2, ab1)


def loop_compare_boundary(a: "Loop", b: "Loop", b_is_hole: bool = False) -> int:
    """+1 if A contains B's boundary, -1 if A excludes it, 0 if they cross
    (loop.rs:1125-1168 + CompareBoundaryRelation wedge rule)."""
    if not a.bound.intersects_rect(b.bound):
        return -1
    a_full = len(a.vertices) == 1 and a.origin_inside
    b_full = len(b.vertices) == 1 and b.origin_inside
    if a_full:
        return 1
    if b_full:
        return -1
    contains_edge = excludes_edge = False
    found_shared = False
    na, nb = len(a.vertices), len(b.vertices)
    for i in range(na):
        vi = a.vertices[i]
        for j in range(nb):
            if np.array_equal(vi, b.vertices[j]):
                found_shared = True
                if wedge_contains_semi_wedge(
                    a.vertices[(i - 1) % na],
                    vi,
                    a.vertices[(i + 1) % na],
                    b.vertices[(j + 1) % nb],
                    b_is_hole,
                ):
                    contains_edge = True
                else:
                    excludes_edge = True
                if contains_edge and excludes_edge:
                    return 0
    # Unconditional sweep — see loop_contains_loop note (loop.rs:978).
    if _edges_cross(a, b):
        return 0
    if found_shared:
        return 1 if contains_edge else -1
    return 1 if a.contains_point(b.vertices[0]) else -1


def _sinterval_union_full(a, b) -> bool:
    """Whether the union of two longitude intervals could span all
    longitudes.  Conservative toward True (the caller only uses False as an
    early exit), never False when the union is actually full."""
    if a.is_full or b.is_full:
        return True
    if a.is_empty or b.is_empty:
        return False
    return a.length + b.length >= 2 * PI - 1e-15


def polygon_contains_polygon(a: "Polygon", b: "Polygon") -> bool:
    """A.contains(B) via the general nested-hierarchy boundary algebra
    (polygon.rs:1064-1103)."""
    return a.contains(b)


def polygon_intersects_polygon(a: "Polygon", b: "Polygon") -> bool:
    """A.intersects(B) (polygon.rs:1201-1231)."""
    return a.intersects(b)


# ---------------------------------------------------------------------------
# Robust edge intersection point (edge_crossings.rs:159-395)
# ---------------------------------------------------------------------------

INTERSECTION_ERROR = 8.0 * DBL_EPSILON
INTERSECTION_MERGE_RADIUS = 2.0 * INTERSECTION_ERROR
_EPS14 = 1e-14  # consts.rs:8 (the reference's coarse epsilon)
# NOTE: with the reference's EPSILON=1e-14 substituted where canonical S2
# uses dblEpsilon, the stable-path acceptance gate (INTERSECTION_ERROR -
# EPSILON) is negative, so the stable path never accepts and every call
# falls through to the exact path — slower but exact. We keep the
# reference's constants for parity; the exact tier is genuinely exact here
# (Fraction), unlike the reference's PreciseVector stub paths.


def _projection_dist(x, a_norm, a_norm_len: float, a0, a1):
    """(signed distance of x to plane(a0,a1) scaled by |a_norm|, error bound)
    — edge_crossings.rs:218-257."""
    x0 = x - a0
    x1 = x - a1
    x0d2 = float(x0 @ x0)
    x1d2 = float(x1 @ x1)
    if x0d2 < x1d2 or (x0d2 == x1d2 and tuple(x0) < tuple(x1)):
        dist = math.sqrt(x0d2)
        proj = float(x0 @ a_norm)
    else:
        dist = math.sqrt(x1d2)
        proj = float(x1 @ a_norm)
    bound = (
        ((3.5 + 2.0 * math.sqrt(3.0)) * a_norm_len + 32.0 * math.sqrt(3.0) * DBL_EPSILON)
        * dist
        + 1.5 * abs(proj)
    ) * _EPS14
    return proj, bound


def _compare_edges(a0, a1, b0, b1) -> bool:
    if tuple(a1) < tuple(a0):
        a0, a1 = a1, a0
    if tuple(b1) < tuple(b0):
        b0, b1 = b1, b0
    return tuple(a0) < tuple(b0) or (np.array_equal(a0, b0) and tuple(b0) < tuple(b1))


def _intersection_stable_sorted(a0, a1, b0, b1):
    """edge_crossings.rs:303-347; returns unit point or None."""
    a_norm = np.cross(a0 - a1, a0 + a1)
    a_norm_len = float(np.linalg.norm(a_norm))
    b_len = float(np.linalg.norm(b1 - b0))
    b0_dist, b0_err = _projection_dist(b0, a_norm, a_norm_len, a0, a1)
    b1_dist, b1_err = _projection_dist(b1, a_norm, a_norm_len, a0, a1)
    dist_sum = abs(b0_dist - b1_dist)
    err_sum = b0_err + b1_err
    if dist_sum <= err_sum:
        return None
    x = b1 * b0_dist - b0 * b1_dist
    err = (
        b_len * abs(b0_dist * b1_err - b1_dist * b0_err) / (dist_sum - err_sum)
        + 2.0 * dist_sum * DBL_EPSILON
    )
    x_len = float(np.linalg.norm(x))
    if err > (INTERSECTION_ERROR - _EPS14) * x_len:
        return None
    return x / x_len


def _intersection_stable(a0, a1, b0, b1):
    a_len2 = float((a1 - a0) @ (a1 - a0))
    b_len2 = float((b1 - b0) @ (b1 - b0))
    if a_len2 < b_len2 or (a_len2 == b_len2 and _compare_edges(a0, a1, b0, b1)):
        return _intersection_stable_sorted(b0, b1, a0, a1)
    return _intersection_stable_sorted(a0, a1, b0, b1)


def _fcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def intersection_exact(a0, a1, b0, b1) -> np.ndarray:
    """Exact-arithmetic intersection direction (edge_crossings.rs:354-395);
    result rounded to doubles, sign NOT fixed. Collinear edges return the
    lexicographically-smallest interior endpoint."""
    fa0, fa1 = _frac(a0), _frac(a1)
    fb0, fb1 = _frac(b0), _frac(b1)
    a_norm_f = _fcross(fa0, fa1)
    b_norm_f = _fcross(fb0, fb1)
    x_f = _fcross(a_norm_f, b_norm_f)
    x = np.array([float(v) for v in x_f])
    if not np.any(x):
        # exactly collinear (edge_crossings.rs:373-392)
        a_norm = np.array([float(v) for v in a_norm_f])
        b_norm = np.array([float(v) for v in b_norm_f])
        best = None
        for p, (c0, c1, nrm) in (
            (a0, (b0, b1, b_norm)),
            (a1, (b0, b1, b_norm)),
            (b0, (a0, a1, a_norm)),
            (b1, (a0, a1, a_norm)),
        ):
            if ordered_ccw(c0, p, c1, nrm) and (best is None or tuple(p) < tuple(best)):
                best = p
        return np.asarray(best if best is not None else a0, dtype=np.float64)
    return x / np.linalg.norm(x)


def edge_intersection(a0, a1, b0, b1) -> np.ndarray:
    """Robust intersection point of crossing edges AB and CD
    (edge_crossings.rs:159-190): stable path, exact fallback, then the
    sign fix that makes the result invariant under edge swap/reversal."""
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    pt = _intersection_stable(a0, a1, b0, b1)
    if pt is None:
        pt = intersection_exact(a0, a1, b0, b1)
    if float(pt @ (a0 + a1 + b0 + b1)) < 0.0:
        pt = -pt
    return pt


def regular_loop(center, radius_rad: float, n_vertices: int) -> "Loop":
    """Regular n-gon loop of angular radius around center
    (loop.rs:1299-1312, point.rs:435-465) — the synthetic-polygon generator
    used by the reference's randomized tests."""
    center = np.asarray(center, dtype=np.float64)
    # orthonormal frame with center as +z (point.rs frame semantics)
    z_ax = center / np.linalg.norm(center)
    x_ax = _ortho(z_ax)
    y_ax = np.cross(z_ax, x_ax)
    z = math.cos(radius_rad)
    r = math.sin(radius_rad)
    step = 2.0 * math.pi / n_vertices
    verts = []
    for i in range(n_vertices):
        ang = i * step
        p = x_ax * (r * math.cos(ang)) + y_ax * (r * math.sin(ang)) + z_ax * z
        verts.append(p / np.linalg.norm(p))
    return Loop(np.asarray(verts))
