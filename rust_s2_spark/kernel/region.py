"""Query-shape regions: intervals, ChordAngle, Cap, Rect, Cell.

Parity: /root/reference/src/s2/r1/interval.rs, s1/interval.rs, s1/chordangle.rs,
cap.rs, rect.rs:490-691, cell.rs:40-444, stuv.rs:106-237.

These are *scalar* Python objects: they model the handful of query regions per
job (the coverer runs per region, not per document), so clarity beats
vectorization here.  The per-document hot paths (cap radius refine, bbox
refine) live in engine.join as numpy kernels instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .constants import DBL_EPSILON, MAX_LEVEL, MIN_WIDTH
from . import hierarchy, hilbert, stuv

PI = math.pi
DBL_EPSILON_C = 2.220446049250313e-16

# ---------------------------------------------------------------------------
# r1::Interval — closed interval on the line (r1/interval.rs:27-40)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RInterval:
    lo: float
    hi: float

    @staticmethod
    def empty() -> "RInterval":
        return RInterval(1.0, 0.0)

    @staticmethod
    def from_point(p: float) -> "RInterval":
        return RInterval(p, p)

    @property
    def is_empty(self) -> bool:
        return self.lo > self.hi

    def add_point(self, p: float) -> "RInterval":
        if self.is_empty:
            return RInterval(p, p)
        return RInterval(min(self.lo, p), max(self.hi, p))

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def contains_interval(self, o: "RInterval") -> bool:
        if o.is_empty:
            return True
        return self.lo <= o.lo and o.hi <= self.hi

    def intersects(self, o: "RInterval") -> bool:
        if self.lo <= o.lo:
            return o.lo <= self.hi and o.lo <= o.hi
        return self.lo <= o.hi and self.lo <= self.hi

    def expanded(self, margin: float) -> "RInterval":
        if self.is_empty:
            return self
        return RInterval(self.lo - margin, self.hi + margin)

    def interior_contains_interval(self, o: "RInterval") -> bool:
        if o.is_empty:
            return True
        return o.lo > self.lo and o.hi < self.hi

    def interior_intersects(self, o: "RInterval") -> bool:
        return (
            not self.is_empty
            and not o.is_empty
            and o.lo < self.hi
            and self.lo < o.hi
            and self.lo < self.hi
        )

    def interior_contains(self, p: float) -> bool:
        return self.lo < p < self.hi

    def directed_hausdorff_distance(self, o: "RInterval") -> float:
        if self.is_empty:
            return 0.0
        if o.is_empty:
            return np.inf
        return max(0.0, max(self.hi - o.hi, o.lo - self.lo))

    def intersection(self, o: "RInterval") -> "RInterval":
        return RInterval(max(self.lo, o.lo), min(self.hi, o.hi))

    @property
    def center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    @property
    def length(self) -> float:
        return self.hi - self.lo


# ---------------------------------------------------------------------------
# s1::Interval — interval on the circle, can be inverted (s1/interval.rs:36-50)
# ---------------------------------------------------------------------------


def _positive_distance(a: float, b: float) -> float:
    d = b - a
    if d >= 0:
        return d
    return (b + PI) - (a - PI)


@dataclass(frozen=True)
class SInterval:
    lo: float
    hi: float

    @staticmethod
    def empty() -> "SInterval":
        return SInterval(PI, -PI)

    @staticmethod
    def full() -> "SInterval":
        return SInterval(-PI, PI)

    @staticmethod
    def from_endpoints(lo: float, hi: float) -> "SInterval":
        if lo == -PI and hi != PI:
            lo = PI
        if hi == -PI and lo != PI:
            hi = PI
        return SInterval(lo, hi)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "SInterval":
        if p1 == -PI:
            p1 = PI
        if p2 == -PI:
            p2 = PI
        if _positive_distance(p1, p2) <= PI:
            return SInterval(p1, p2)
        return SInterval(p2, p1)

    @property
    def is_empty(self) -> bool:
        return self.lo == PI and self.hi == -PI

    @property
    def is_full(self) -> bool:
        return self.lo == -PI and self.hi == PI

    @property
    def is_inverted(self) -> bool:
        return self.lo > self.hi

    @property
    def length(self) -> float:
        l = self.hi - self.lo
        if l >= 0:
            return l
        l += 2 * PI
        return l if l > 0 else -1.0

    @property
    def center(self) -> float:
        c = 0.5 * (self.lo + self.hi)
        if not self.is_inverted:
            return c
        if c <= 0:
            return c + PI
        return c - PI

    def _fast_contains(self, p: float) -> bool:
        if self.is_inverted:
            return (p >= self.lo or p <= self.hi) and not self.is_empty
        return self.lo <= p <= self.hi

    def contains(self, p: float) -> bool:
        if p == -PI:
            p = PI
        return self._fast_contains(p)

    def contains_interval(self, o: "SInterval") -> bool:
        if self.is_inverted:
            if o.is_inverted:
                return o.lo >= self.lo and o.hi <= self.hi
            return (o.lo >= self.lo or o.hi <= self.hi) and not self.is_empty
        if o.is_inverted:
            return self.is_full or o.is_empty
        return o.lo >= self.lo and o.hi <= self.hi

    def interior_contains(self, p: float) -> bool:
        if self.is_inverted:
            if not self.is_empty:
                return p > self.lo or p < self.hi
            return False
        if p == -PI:
            p = PI
        return (self.lo < p < self.hi) or (self.is_full and p == self.lo)

    def interior_contains_interval(self, o: "SInterval") -> bool:
        if self.is_inverted:
            if not o.is_inverted:
                return o.lo > self.lo or o.hi < self.hi
            return (o.lo > self.lo and o.hi < self.hi) or o.is_empty
        if o.is_inverted:
            return self.is_full or o.is_empty
        return (o.lo > self.lo and o.hi < self.hi) or self.is_full

    def interior_intersects(self, o: "SInterval") -> bool:
        if self.is_empty or o.is_empty or self.lo == self.hi:
            return False
        if self.is_inverted:
            return o.is_inverted or o.lo < self.hi or o.hi > self.lo
        if o.is_inverted:
            return o.lo < self.hi or o.hi > self.lo
        return (o.lo < self.hi and o.hi > self.lo) or self.is_full

    def intersects(self, o: "SInterval") -> bool:
        if self.is_empty or o.is_empty:
            return False
        if self.is_inverted:
            return o.is_inverted or o.lo <= self.hi or o.hi >= self.lo
        if o.is_inverted:
            return o.lo <= self.hi or o.hi >= self.lo
        return o.lo <= self.hi and o.hi >= self.lo

    def add_point(self, p: float) -> "SInterval":
        if abs(p) > PI:
            return self
        if p == -PI:
            p = PI
        if self._fast_contains(p):
            return self
        if self.is_empty:
            return SInterval(p, p)
        if _positive_distance(p, self.lo) < _positive_distance(self.hi, p):
            return SInterval(p, self.hi)
        return SInterval(self.lo, p)

    def complement_center(self) -> float:
        """Center of the complement interval (s1/interval.rs semantics)."""
        if self.lo != self.hi:
            return SInterval(self.hi, self.lo).center
        return self.hi + np.pi if self.hi <= 0 else self.hi - np.pi

    def directed_hausdorff_distance(self, y: "SInterval") -> float:
        """max_{p in self} min_{q in y} d(p,q) on S1 (s1/interval.rs:387-420)."""
        if y.contains_interval(self):
            return 0.0
        if y.is_empty:
            return np.pi
        ycc = y.complement_center()
        if self.contains(ycc):
            return _positive_distance(y.hi, ycc)
        hi_hi = (
            _positive_distance(y.hi, self.hi)
            if SInterval(y.hi, ycc).contains(self.hi)
            else 0.0
        )
        lo_lo = (
            _positive_distance(self.lo, y.lo)
            if SInterval(ycc, y.lo).contains(self.lo)
            else 0.0
        )
        return max(hi_hi, lo_lo)

    def expanded(self, margin: float) -> "SInterval":
        if margin >= 0:
            if self.is_empty:
                return self
            if self.length + 2 * margin + 2 * DBL_EPSILON >= 2 * PI:
                return SInterval.full()
        else:
            if self.is_full:
                return self
            if self.length + 2 * margin - 2 * DBL_EPSILON <= 0:
                return SInterval.empty()
        result = SInterval.from_endpoints(
            math.remainder(self.lo - margin, 2 * PI),
            math.remainder(self.hi + margin, 2 * PI),
        )
        if result.lo <= -PI:
            result = SInterval(PI, result.hi)
        return result


# ---------------------------------------------------------------------------
# ChordAngle — squared chord length in [0,4] (s1/chordangle.rs:43-57)
# ---------------------------------------------------------------------------

CHORD_NEGATIVE = -1.0
CHORD_STRAIGHT = 4.0
CHORD_RIGHT = 2.0


def _s_intersection(i: SInterval, o: SInterval) -> SInterval:
    """s1 interval intersection (s1/interval.rs semantics)."""
    if o.is_empty or i.is_empty:
        return SInterval.empty()
    if i._fast_contains(o.lo):
        if i._fast_contains(o.hi):
            if o.length < i.length:
                return o
            return i
        return SInterval(o.lo, i.hi)
    if i._fast_contains(o.hi):
        return SInterval(i.lo, o.hi)
    if o._fast_contains(i.lo):
        return i
    return SInterval.empty()



def chord_from_angle(rad: float) -> float:
    if rad < 0:
        return CHORD_NEGATIVE
    if math.isinf(rad):
        return math.inf
    l = 2.0 * math.sin(0.5 * min(PI, rad))
    return l * l


def chord_angle_rad(chord2: float) -> float:
    if chord2 < 0:
        return -1.0
    if chord2 >= CHORD_STRAIGHT:
        return PI
    return 2.0 * math.asin(0.5 * math.sqrt(chord2))


def chord_sin2(chord2: float) -> float:
    return chord2 * (1.0 - 0.25 * chord2)


def chord_add(a: float, b: float) -> float:
    """Angle-sum of two chord angles without trig (chordangle.rs semantics)."""
    if b == 0:
        return a
    if a + b >= CHORD_STRAIGHT:
        return CHORD_STRAIGHT
    x = a * (1.0 - 0.25 * b)
    y = b * (1.0 - 0.25 * a)
    return min(CHORD_STRAIGHT, x + y + 2.0 * math.sqrt(x * y))


def chord2_between(p: np.ndarray, q: np.ndarray) -> float:
    """Squared chord distance (point.rs:424-429): min(4, |p-q|^2)."""
    d = p - q
    return min(CHORD_STRAIGHT, float(d @ d))


# ---------------------------------------------------------------------------
# Cell — decoded cell for region tests (cell.rs:40-444)
# ---------------------------------------------------------------------------


def _latlng_point(lat_rad: float, lng_rad: float) -> np.ndarray:
    cl = math.cos(lat_rad)
    return np.array([cl * math.cos(lng_rad), cl * math.sin(lng_rad), math.sin(lat_rad)])


_U_AXES = np.array(
    [[0, 1, 0], [-1, 0, 0], [-1, 0, 0], [0, 0, -1], [0, 0, -1], [0, 1, 0]], dtype=float
)
_V_AXES = np.array(
    [[0, 0, 1], [0, 0, 1], [0, -1, 0], [0, -1, 0], [1, 0, 0], [1, 0, 0]], dtype=float
)
_NORM_AXES = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]], dtype=float
)

POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3.0)) - 0.5 * DBL_EPSILON


def _unorm(face: int, u: float) -> np.ndarray:
    # stuv.rs:161-171
    return [
        np.array([u, -1.0, 0.0]),
        np.array([1.0, u, 0.0]),
        np.array([1.0, 0.0, u]),
        np.array([-u, 0.0, 1.0]),
        np.array([0.0, -u, 1.0]),
        np.array([0.0, -1.0, -u]),
    ][face]


def _vnorm(face: int, v: float) -> np.ndarray:
    # stuv.rs:173-183
    return [
        np.array([-v, 0.0, 1.0]),
        np.array([0.0, -v, 1.0]),
        np.array([0.0, -1.0, -v]),
        np.array([v, -1.0, 0.0]),
        np.array([1.0, v, 0.0]),
        np.array([1.0, 0.0, v]),
    ][face]


class Cell:
    """Decoded cell: face/level/uv-rect + region tests (cell.rs:50-63)."""

    __slots__ = ("id", "face", "level", "orientation", "u_lo", "u_hi", "v_lo", "v_hi", "_verts")

    def __init__(self, cid: int):
        cid = np.uint64(cid)
        f, i, j, o = (int(v) for v in hilbert.cellid_to_face_ij_orientation(cid))
        lvl = int(hierarchy.level(cid))
        self.id = int(cid)
        self.face = f
        self.level = lvl
        self.orientation = o
        # ij_level_to_bound_uv (cellid.rs:998-1013)
        cell_size = int(hierarchy.size_ij(lvl))
        x_lo = i & -cell_size
        y_lo = j & -cell_size
        self.u_lo = float(stuv.st_to_uv(stuv.ij_to_stmin(x_lo)))
        self.u_hi = float(stuv.st_to_uv(stuv.ij_to_stmin(x_lo + cell_size)))
        self.v_lo = float(stuv.st_to_uv(stuv.ij_to_stmin(y_lo)))
        self.v_hi = float(stuv.st_to_uv(stuv.ij_to_stmin(y_lo + cell_size)))

    def _uv_vertex(self, k: int) -> tuple[float, float]:
        # CCW: lower-left, lower-right, upper-right, upper-left (r2 rect order)
        return [
            (self.u_lo, self.v_lo),
            (self.u_hi, self.v_lo),
            (self.u_hi, self.v_hi),
            (self.u_lo, self.v_hi),
        ][k]

    def vertex(self, k: int) -> np.ndarray:
        u, v = self._uv_vertex(k)
        x, y, z = (float(c) for c in stuv.face_uv_to_xyz(self.face, u, v))
        n = math.sqrt(x * x + y * y + z * z)
        return np.array([x / n, y / n, z / n])

    def vertices(self) -> list[np.ndarray]:
        # memoized: region tests (coverer candidate expansion) hit the same
        # cell's vertices repeatedly and vertex construction dominates there
        try:
            return self._verts
        except AttributeError:
            self._verts = [self.vertex(k) for k in range(4)]
            return self._verts

    def edge(self, k: int) -> np.ndarray:
        """Inward great-circle normal of edge k (cell.rs:139-147), normalized."""
        if k == 0:
            e = _vnorm(self.face, self.v_lo)
        elif k == 1:
            e = _unorm(self.face, self.u_hi)
        elif k == 2:
            e = -_vnorm(self.face, self.v_hi)
        else:
            e = -_unorm(self.face, self.u_lo)
        return e / np.linalg.norm(e)

    def center(self) -> np.ndarray:
        x, y, z = hilbert.cellid_to_xyz(np.uint64(self.id))
        return np.array([float(x), float(y), float(z)])

    def exact_area(self) -> float:
        """Exact cell area as two spherical triangles (cell.rs:213-217)."""
        from .pip import triangle_area

        v = self.vertices()
        return triangle_area(v[0], v[1], v[2]) + triangle_area(v[0], v[2], v[3])

    def approx_area(self) -> float:
        """Flat diagonal-cross area with a spherical-cap curvature
        compensation; within ~3% everywhere, ~0.1% at level>=5
        (cell.rs:219-245)."""
        from .constants import AVG_AREA

        if self.level < 2:
            return self.average_area()
        v = self.vertices()
        flat_area = 0.5 * float(np.linalg.norm(np.cross(v[2] - v[0], v[3] - v[1])))
        return flat_area * 2.0 / (1.0 + math.sqrt(1.0 - min(flat_area / math.pi, 1.0)))

    def average_area(self) -> float:
        """Average area of cells at this level (cell.rs:247-251)."""
        from .constants import AVG_AREA

        return AVG_AREA.value(self.level)

    def contains_point(self, p: np.ndarray) -> bool:
        """uv-rect test expanded by DBL_EPSILON (cell.rs:400-415)."""
        n = _NORM_AXES[self.face]
        if float(p @ n) <= 0:
            return False
        u, v = (float(c) for c in stuv.valid_face_xyz_to_uv(self.face, p[0], p[1], p[2]))
        return (
            self.u_lo - DBL_EPSILON <= u <= self.u_hi + DBL_EPSILON
            and self.v_lo - DBL_EPSILON <= v <= self.v_hi + DBL_EPSILON
        )

    def _latitude(self, i: int, j: int) -> float:
        u = self.u_lo if i == 0 else self.u_hi
        v = self.v_lo if j == 0 else self.v_hi
        x, y, z = (float(c) for c in stuv.face_uv_to_xyz(self.face, u, v))
        return math.atan2(z, math.sqrt(x * x + y * y))

    def _longitude(self, i: int, j: int) -> float:
        u = self.u_lo if i == 0 else self.u_hi
        v = self.v_lo if j == 0 else self.v_hi
        x, y, _ = (float(c) for c in stuv.face_uv_to_xyz(self.face, u, v))
        return math.atan2(y, x)

    def rect_bound(self) -> "Rect":
        """Exact lat/lng bound (cell.rs:279-391)."""
        if self.level > 0:
            u = self.u_lo + self.u_hi
            v = self.v_lo + self.v_hi
            u_axis_z = _U_AXES[self.face][2]
            v_axis_z = _V_AXES[self.face][2]
            if u_axis_z == 0.0:
                i = 1 if u < 0 else 0
            else:
                i = 1 if u > 0 else 0
            if v_axis_z == 0.0:
                j = 1 if v < 0 else 0
            else:
                j = 1 if v > 0 else 0
            lat = RInterval.from_point(self._latitude(i, j)).add_point(
                self._latitude(1 - i, 1 - j)
            )
            lng = SInterval.empty().add_point(self._longitude(i, 1 - j)).add_point(
                self._longitude(1 - i, j)
            )
            max_err = 2.0 * DBL_EPSILON
            return Rect(lat, lng).expanded(max_err, max_err).polar_closure()

        pi4 = PI / 4
        table = {
            0: Rect(RInterval(-pi4, pi4), SInterval(-pi4, pi4)),
            1: Rect(RInterval(-pi4, pi4), SInterval(pi4, 3 * pi4)),
            2: Rect(RInterval(POLE_MIN_LAT, PI / 2), SInterval.full()),
            3: Rect(RInterval(-pi4, pi4), SInterval(3 * pi4, -3 * pi4)),
            4: Rect(RInterval(-pi4, pi4), SInterval(-3 * pi4, -pi4)),
            5: Rect(RInterval(-PI / 2, -POLE_MIN_LAT), SInterval.full()),
        }
        return table[self.face].expanded(DBL_EPSILON, 0.0)

    # --- Region interface (cell.rs:418-444) ---

    def cap_bound(self) -> "Cap":
        """Bounding cap centered at the uv-center (cell.rs:420-433)."""
        cu = 0.5 * (self.u_lo + self.u_hi)
        cv = 0.5 * (self.v_lo + self.v_hi)
        x, y, z = (float(c) for c in stuv.face_uv_to_xyz(self.face, cu, cv))
        center = np.array([x, y, z])
        center /= np.linalg.norm(center)
        cap = Cap(center, 0.0)
        for v in self.vertices():
            r2 = chord2_between(cap.center, v)
            if r2 > cap.radius2:
                cap = Cap(cap.center, r2)
        return cap

    def contains_cell(self, other: "Cell") -> bool:
        return bool(hierarchy.contains(np.uint64(self.id), np.uint64(other.id)))

    def intersects_cell(self, other: "Cell") -> bool:
        return bool(hierarchy.intersects(np.uint64(self.id), np.uint64(other.id)))

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()


# ---------------------------------------------------------------------------
# Cap — disc region (cap.rs:73-360)
# ---------------------------------------------------------------------------


class Cap:
    __slots__ = ("center", "radius2")

    def __init__(self, center: np.ndarray, radius2: float):
        self.center = np.asarray(center, dtype=float)
        self.radius2 = float(radius2)

    @staticmethod
    def from_latlng_radius(lat_deg: float, lng_deg: float, radius_deg: float) -> "Cap":
        c = _latlng_point(math.radians(lat_deg), math.radians(lng_deg))
        return Cap(c, chord_from_angle(math.radians(radius_deg)))

    @staticmethod
    def empty() -> "Cap":
        return Cap(np.array([1.0, 0.0, 0.0]), CHORD_NEGATIVE)

    @staticmethod
    def full() -> "Cap":
        return Cap(np.array([1.0, 0.0, 0.0]), CHORD_STRAIGHT)

    @property
    def is_empty(self) -> bool:
        return self.radius2 < 0

    @property
    def is_full(self) -> bool:
        return self.radius2 == CHORD_STRAIGHT

    def radius_rad(self) -> float:
        return chord_angle_rad(self.radius2)

    def height(self) -> float:
        return 0.5 * self.radius2

    def contains_point(self, p: np.ndarray) -> bool:
        # cap.rs:212-214: squared-chord compare, no trig.
        return chord2_between(self.center, p) <= self.radius2

    def complement(self) -> "Cap":
        if self.is_full:
            return Cap.empty()
        if self.is_empty:
            return Cap.full()
        return Cap(-self.center, CHORD_STRAIGHT - self.radius2)

    @property
    def is_valid(self) -> bool:
        """cap.rs:143-145."""
        return abs(float(self.center @ self.center) - 1.0) < 5e-14 and self.radius2 <= 4.0

    def interior_contains_point(self, p: np.ndarray) -> bool:
        """cap.rs:217-219: strict chord inequality (boundary excluded)."""
        if self.is_full:
            return True
        d = self.center - np.asarray(p, dtype=float)
        return float(d @ d) < self.radius2

    def interior_intersects_cap(self, other: "Cap") -> bool:
        """cap.rs:202-209: this cap's interior meets the other cap."""
        if self.radius2 <= 0.0 or other.is_empty:
            return False
        d = self.center - other.center
        ra = math.sqrt(max(self.radius2, 0.0))
        rb = math.sqrt(max(other.radius2, 0.0))
        return ra + rb > math.sqrt(float(d @ d))

    def approx_eq(self, other: "Cap", eps: float = 1e-14) -> bool:
        return (
            float(np.linalg.norm(self.center - other.center)) <= eps
            and abs(self.radius2 - other.radius2) <= eps
        )

    def contains_cap(self, other: "Cap") -> bool:
        if self.is_full or other.is_empty:
            return True
        return self.radius2 >= chord_add(
            chord2_between(self.center, other.center), other.radius2
        )

    def intersects_cap(self, other: "Cap") -> bool:
        if self.is_empty or other.is_empty:
            return False
        return chord_add(self.radius2, other.radius2) >= chord2_between(
            self.center, other.center
        )

    def expanded(self, rad: float) -> "Cap":
        if self.is_empty:
            return Cap.empty()
        return Cap(self.center, chord_from_angle(self.radius_rad() + rad))

    # --- Region interface (cap.rs:262-412) ---

    def cap_bound(self) -> "Cap":
        return self

    def area(self) -> float:
        """Surface area = 2*pi*height (cap.rs)."""
        return 2.0 * np.pi * max(0.0, self.height())

    @staticmethod
    def from_center_area(center: np.ndarray, area: float) -> "Cap":
        """cap.rs:125-127: radius2 = area / pi."""
        return Cap(np.asarray(center, dtype=np.float64), area / np.pi)

    @staticmethod
    def from_center_height(center: np.ndarray, height: float) -> "Cap":
        """cap.rs:118-122: radius2 = 2*height."""
        return Cap(np.asarray(center, dtype=np.float64), 2.0 * height)

    def add_point(self, p: np.ndarray) -> "Cap":
        """Grow to include p (cap.rs:485-500)."""
        p = np.asarray(p, dtype=np.float64)
        if self.is_empty:
            return Cap(p.copy(), 0.0)
        return Cap(self.center.copy(), max(self.radius2, chord2_between(self.center, p)))

    def add_cap(self, other: "Cap") -> "Cap":
        """Grow to include the other cap (cap.rs:508-525)."""
        if self.is_empty:
            return Cap(other.center.copy(), other.radius2)
        if other.is_empty:
            return Cap(self.center.copy(), self.radius2)
        dist = chord_add(chord2_between(self.center, other.center), other.radius2)
        dist = dist + DBL_EPSILON_C * dist  # conservative rounding (cap.rs:521)
        return Cap(self.center.copy(), max(self.radius2, min(dist, 4.0)))

    def centroid(self) -> np.ndarray:
        """Area-weighted centroid vector (cap.rs:426-445); empty -> origin."""
        if self.is_empty:
            return np.zeros(3)
        r = 1.0 - 0.5 * self.height()
        return self.center * (r * self.area())

    def union(self, other: "Cap") -> "Cap":
        """Smallest cap enclosing both (cap.rs:447-474; canonical chord math —
        the reference builds the result radius as if radians were a squared
        chord, an off-test-path bug)."""
        from .edgeutil import interpolate_at_distance

        a, b = (self, other) if self.radius2 > other.radius2 else (other, self)
        if a.is_full or b.is_empty:
            return Cap(a.center.copy(), a.radius2)
        a_r = a.radius_rad()
        b_r = b.radius_rad()
        dist = float(
            np.arctan2(np.linalg.norm(np.cross(a.center, b.center)), np.dot(a.center, b.center))
        )
        if a_r >= dist + b_r:
            return Cap(a.center.copy(), a.radius2)
        res_radius = 0.5 * (dist + a_r + b_r)
        res_center = interpolate_at_distance(
            0.5 * (dist - a_r + b_r), self.center, other.center
        )
        return Cap(np.asarray(res_center), chord_from_angle(res_radius))

    def rect_bound(self) -> "Rect":
        if self.is_empty:
            return Rect.empty()
        cap_angle = self.radius_rad()
        center_lat = math.atan2(
            self.center[2], math.hypot(self.center[0], self.center[1])
        )
        lat = RInterval(center_lat - cap_angle, center_lat + cap_angle)
        lng = SInterval.full()
        all_longitudes = False
        if lat.lo < -PI / 2:
            lat = RInterval(-PI / 2, lat.hi)
            all_longitudes = True
        if lat.hi > PI / 2:
            lat = RInterval(lat.lo, PI / 2)
            all_longitudes = True
        if not all_longitudes:
            sin_a = math.sin(cap_angle)
            sin_c = math.cos(center_lat)
            if sin_a <= sin_c:
                angle_a = math.asin(sin_a / sin_c)
                center_lng = math.atan2(self.center[1], self.center[0])
                lng = SInterval(
                    math.remainder(center_lng - angle_a, 2 * PI),
                    math.remainder(center_lng + angle_a, 2 * PI),
                )
        return Rect(lat, lng)

    def _intersects_cell_vertices(self, cell: Cell, vertices: list[np.ndarray]) -> bool:
        # cap.rs:365-412
        if self.radius2 >= CHORD_RIGHT:
            return False
        if self.is_empty:
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = chord_sin2(self.radius2)
        for k in range(4):
            edge = cell.edge(k)
            dot = float(self.center @ edge)
            if dot > 0:
                continue
            if dot * dot > sin2_angle:  # edge is normalized (cell.rs:139-147)
                return False
            direction = np.cross(edge, self.center)
            if float(direction @ vertices[k]) < 0 and float(direction @ vertices[(k + 1) & 3]) > 0:
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        vertices = cell.vertices()
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects_cell_vertices(cell, vertices)

    def intersects_cell(self, cell: Cell) -> bool:
        vertices = cell.vertices()
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects_cell_vertices(cell, vertices)

    def cell_union_bound(self) -> list[int]:
        # cap.rs:344-359
        lvl = MIN_WIDTH.max_level(self.radius_rad())
        if lvl == 0:
            return [int(hierarchy.from_face(f)) for f in range(6)]
        cid = hilbert.cellid_from_xyz(*self.center)
        nbrs = hierarchy.vertex_neighbors(np.uint64(cid), lvl - 1)
        return sorted(set(int(n) for n in np.atleast_1d(nbrs).ravel()))


# ---------------------------------------------------------------------------
# Rect — lat/lng rectangle region (rect.rs)
# ---------------------------------------------------------------------------


class Rect:
    __slots__ = ("lat", "lng")

    def __init__(self, lat: RInterval, lng: SInterval):
        self.lat = lat
        self.lng = lng

    @staticmethod
    def empty() -> "Rect":
        return Rect(RInterval.empty(), SInterval.empty())

    @staticmethod
    def from_degrees(lat_lo: float, lng_lo: float, lat_hi: float, lng_hi: float) -> "Rect":
        """Corners in degrees; lng interval may be inverted (crosses ±180)."""
        return Rect(
            RInterval(math.radians(lat_lo), math.radians(lat_hi)),
            SInterval.from_endpoints(math.radians(lng_lo), math.radians(lng_hi)),
        )

    @property
    def is_empty(self) -> bool:
        return self.lat.is_empty

    def center_latlng(self) -> tuple[float, float]:
        return self.lat.center, self.lng.center

    def vertex_latlng(self, k: int) -> tuple[float, float]:
        # CCW order: (lat_lo,lng_lo), (lat_lo,lng_hi), (lat_hi,lng_hi), (lat_hi,lng_lo)
        return [
            (self.lat.lo, self.lng.lo),
            (self.lat.lo, self.lng.hi),
            (self.lat.hi, self.lng.hi),
            (self.lat.hi, self.lng.lo),
        ][k]

    def contains_latlng_rad(self, lat: float, lng: float) -> bool:
        return self.lat.contains(lat) and self.lng.contains(lng)

    def contains_point(self, p: np.ndarray) -> bool:
        lat = math.atan2(p[2], math.hypot(p[0], p[1]))
        lng = math.atan2(p[1], p[0])
        return self.contains_latlng_rad(lat, lng)

    def contains_rect(self, o: "Rect") -> bool:
        return self.lat.contains_interval(o.lat) and self.lng.contains_interval(o.lng)

    def intersects_rect(self, o: "Rect") -> bool:
        return self.lat.intersects(o.lat) and self.lng.intersects(o.lng)

    @staticmethod
    def from_center_size(center_lat: float, center_lng: float, size_lat: float, size_lng: float) -> "Rect":
        """Center/size in radians (rect.rs:62-68)."""
        half = Rect(
            RInterval.from_point(center_lat), SInterval(center_lng, center_lng)
        )
        return half.expanded(0.5 * size_lat, 0.5 * size_lng)

    @staticmethod
    def from_point_pair(lat1: float, lng1: float, lat2: float, lng2: float) -> "Rect":
        """Minimal rect containing two latlng points, radians (rect.rs:86-91)."""
        return Rect(
            RInterval(min(lat1, lat2), max(lat1, lat2)),
            SInterval.from_point_pair(lng1, lng2),
        )

    @property
    def is_valid(self) -> bool:
        """rect.rs:93-98."""
        return (
            abs(self.lat.lo) <= PI / 2
            and self.lat.hi <= PI / 2
            and self.lat.is_empty == self.lng.is_empty
        )

    @property
    def is_point(self) -> bool:
        return self.lat.lo == self.lat.hi and self.lng.lo == self.lng.hi

    @property
    def is_inverted(self) -> bool:
        return self.lng.is_inverted

    def size(self) -> tuple[float, float]:
        """(lat_len, lng_len) radians (rect.rs:151-156)."""
        return self.lat.length, self.lng.length

    def area(self) -> float:
        """Surface area on the unit sphere (rect.rs:158-165)."""
        if self.is_empty:
            return 0.0
        cap_diff = abs(math.sin(self.lat.hi) - math.sin(self.lat.lo))
        return self.lng.length * cap_diff

    def centroid(self) -> np.ndarray:
        """True centroid times the rect's area, not unit length
        (rect.rs:741-805: z from the slice midpoint, xy radius from the
        integrated arc-centroid distance)."""
        if self.is_empty:
            return np.zeros(3)
        z1, z2 = math.sin(self.lat.lo), math.sin(self.lat.hi)
        r1, r2 = math.cos(self.lat.lo), math.cos(self.lat.hi)
        alpha = 0.5 * self.lng.length
        r = math.sin(alpha) * (r2 * z2 - r1 * z1 + self.lat.length)
        lng = self.lng.center
        z = alpha * (z2 + z1) * (z2 - z1)  # scaled by the area
        return np.array([r * math.cos(lng), r * math.sin(lng), z])

    def union(self, o: "Rect") -> "Rect":
        from .pip import _rect_union

        return _rect_union(self, o)

    def intersection(self, o: "Rect") -> "Rect":
        lat = self.lat.intersection(o.lat)
        lng = _s_intersection(self.lng, o.lng)
        if lat.is_empty or lng.is_empty:
            return Rect.empty()
        return Rect(lat, lng)

    def interior_contains_rect(self, o: "Rect") -> bool:
        """rect.rs:710-713."""
        return self.lat.interior_contains_interval(
            o.lat
        ) and self.lng.interior_contains_interval(o.lng)

    def interior_contains_latlng_rad(self, lat: float, lng: float) -> bool:
        """rect.rs:718-720."""
        return self.lat.interior_contains(lat) and self.lng.interior_contains(lng)

    def interior_intersects_rect(self, o: "Rect") -> bool:
        """rect.rs:241-243."""
        return self.lat.interior_intersects(o.lat) and self.lng.interior_intersects(
            o.lng
        )

    def boundary_intersects(self, v0: np.ndarray, v1: np.ndarray) -> bool:
        """Whether geodesic edge (v0, v1) intersects the rect boundary
        (rect.rs:216-240): the two constant-lng geodesic edges plus the two
        constant-lat small-circle edges (skipping poles/full-lng)."""
        if self.is_empty:
            return False
        if not self.lng.is_full:
            if _intersects_lng_edge(v0, v1, self.lat, self.lng.lo):
                return True
            if _intersects_lng_edge(v0, v1, self.lat, self.lng.hi):
                return True
        if self.lat.lo != -PI / 2 and _intersects_lat_edge(v0, v1, self.lat.lo, self.lng):
            return True
        if self.lat.hi != PI / 2 and _intersects_lat_edge(v0, v1, self.lat.hi, self.lng):
            return True
        return False

    def expanded(self, lat_margin: float, lng_margin: float) -> "Rect":
        lat = self.lat.expanded(lat_margin)
        lng = self.lng.expanded(lng_margin)
        if lat.is_empty or lng.is_empty:
            return Rect.empty()
        return Rect(lat.intersection(RInterval(-PI / 2, PI / 2)), lng)

    def polar_closure(self) -> "Rect":
        if self.lat.lo == -PI / 2 or self.lat.hi == PI / 2:
            return Rect(self.lat, SInterval.full())
        return self

    # --- Region interface (rect.rs:490-691) ---

    def rect_bound(self) -> "Rect":
        return self

    def distance_to_latlng_rad(self, lat: float, lng: float) -> float:
        """Distance (radians) from the rect to a lat/lng point (rect.rs:259-280)."""
        from .edgeutil import distance_from_segment

        if self.lng.contains(lng):
            return max(lat - self.lat.hi, self.lat.lo - lat, 0.0)
        i = SInterval(self.lng.hi, self.lng.complement_center())
        rect_lng = self.lng.hi if i.contains(lng) else self.lng.lo
        lo = _latlng_point(self.lat.lo, rect_lng)
        hi = _latlng_point(self.lat.hi, rect_lng)
        p = _latlng_point(lat, lng)
        return float(distance_from_segment(p, lo, hi)[0])

    @staticmethod
    def _bisector_intersection(lat: RInterval, lng: float) -> np.ndarray:
        """rect.rs:407-425."""
        lng = abs(lng)
        lat_center = lat.center
        if lat_center >= 0.0:
            ortho_bisector = _latlng_point(lat_center - np.pi / 2, lng)
        else:
            ortho_bisector = _latlng_point(-lat_center - np.pi / 2, lng - np.pi)
        ortho_lng = np.array([0.0, -1.0, 0.0])
        return np.cross(ortho_lng, ortho_bisector)

    @staticmethod
    def _interior_max_distance(a_lat: RInterval, b: np.ndarray) -> float | None:
        """rect.rs:430-447."""
        if a_lat.is_empty or b[0] >= 0.0:
            return None
        ip = np.array([-b[0], 0.0, -b[2]])
        ip_lat = np.arctan2(ip[2], np.hypot(ip[0], ip[1]))
        if a_lat.interior_contains(ip_lat):
            ipn = ip / np.linalg.norm(ip)
            return float(np.arctan2(np.linalg.norm(np.cross(b, ipn)), np.dot(b, ipn)))
        return None

    @classmethod
    def _hausdorff_helper(cls, lng_diff: float, a: RInterval, b: RInterval) -> float:
        """rect.rs:310-405 — directed distance between two longitudinal edges."""
        from .edgeutil import distance_from_segment

        assert 0.0 <= lng_diff <= np.pi
        if lng_diff == 0.0:
            return a.directed_hausdorff_distance(b)
        b_lo = _latlng_point(b.lo, lng_diff)
        b_hi = _latlng_point(b.hi, lng_diff)
        a_lo = _latlng_point(a.lo, 0.0)
        a_hi = _latlng_point(a.hi, 0.0)
        max_distance = max(
            float(distance_from_segment(a_lo, b_lo, b_hi)[0]),
            float(distance_from_segment(a_hi, b_lo, b_hi)[0]),
        )
        if lng_diff <= np.pi / 2:
            if a.contains(0.0) and b.contains(0.0):
                max_distance = max(max_distance, lng_diff)
            return max_distance
        p = cls._bisector_intersection(b, lng_diff)
        p = p / np.linalg.norm(p)
        p_lat = np.arctan2(p[2], np.hypot(p[0], p[1]))
        if a.contains(p_lat):
            d = float(np.arctan2(np.linalg.norm(np.cross(p, b_lo)), np.dot(p, b_lo)))
            max_distance = max(max_distance, d)
        if p_lat > a.lo:
            d = cls._interior_max_distance(RInterval(a.lo, min(p_lat, a.hi)), b_lo)
            if d is not None:
                max_distance = max(max_distance, d)
        if p_lat < a.hi:
            d = cls._interior_max_distance(RInterval(max(p_lat, a.lo), a.hi), b_hi)
            if d is not None:
                max_distance = max(max_distance, d)
        return max_distance

    def directed_hausdorff_distance(self, other: "Rect") -> float:
        """h(A,B) = max_{p in A} min_{q in B} d(p,q) (rect.rs:291-309)."""
        if self.is_empty:
            return 0.0
        if other.is_empty:
            return np.pi
        lng_distance = self.lng.directed_hausdorff_distance(other.lng)
        return self._hausdorff_helper(lng_distance, self.lat, other.lat)

    def hausdorff_distance(self, other: "Rect") -> float:
        """Undirected Hausdorff distance (rect.rs:285-289)."""
        return max(
            self.directed_hausdorff_distance(other),
            other.directed_hausdorff_distance(self),
        )

    def cap_bound(self) -> Cap:
        if self.is_empty:
            return Cap.empty()
        if self.lat.hi + self.lat.lo < 0:
            pole_z, pole_angle = -1.0, PI / 2 + self.lat.hi
        else:
            pole_z, pole_angle = 1.0, PI / 2 - self.lat.lo
        pole_cap = Cap(np.array([0.0, 0.0, pole_z]), chord_from_angle(pole_angle))
        if math.remainder(self.lng.hi - self.lng.lo, 2 * PI) >= 0 and (
            self.lng.hi - self.lng.lo < 2 * PI
        ):
            clat, clng = self.center_latlng()
            mid = Cap(_latlng_point(clat, clng), 0.0)
            for lat, lng in (
                (self.lat.lo, self.lng.lo),
                (self.lat.hi, self.lng.hi),
            ):
                p = _latlng_point(lat, lng)
                r2 = chord2_between(mid.center, p)
                if r2 > mid.radius2:
                    mid = Cap(mid.center, r2)
            if mid.height() < pole_cap.height():
                return mid
        return pole_cap

    def contains_cell(self, cell: Cell) -> bool:
        # rect.rs:533-544: exact via the cell's rect bound.
        return self.contains_rect(cell.rect_bound())

    def intersects_cell(self, cell: Cell) -> bool:
        # rect.rs:548-617
        if self.is_empty:
            return False
        if self.contains_point(cell.center()):
            return True
        clat, clng = self.center_latlng()
        if cell.contains_point(_latlng_point(clat, clng)):
            return True
        if not self.intersects_rect(cell.rect_bound()):
            return False

        vertices = []
        latlngs = []
        for i in range(4):
            v = cell.vertex(i)
            vertices.append(v)
            vlat = math.atan2(v[2], math.hypot(v[0], v[1]))
            vlng = math.atan2(v[1], v[0])
            latlngs.append((vlat, vlng))
            if self.contains_latlng_rad(vlat, vlng):
                return True
            rlat, rlng = self.vertex_latlng(i)
            if cell.contains_point(_latlng_point(rlat, rlng)):
                return True

        for i in range(4):
            edge_lng = SInterval.from_point_pair(latlngs[i][1], latlngs[(i + 1) & 3][1])
            if not self.lng.intersects(edge_lng):
                continue
            a = vertices[i]
            b = vertices[(i + 1) & 3]
            if edge_lng.contains(self.lng.lo) and _intersects_lng_edge(
                a, b, self.lat, self.lng.lo
            ):
                return True
            if edge_lng.contains(self.lng.hi) and _intersects_lng_edge(
                a, b, self.lat, self.lng.hi
            ):
                return True
            if _intersects_lat_edge(a, b, self.lat.lo, self.lng):
                return True
            if _intersects_lat_edge(a, b, self.lat.hi, self.lng):
                return True
        return False

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()


def _simple_crossing(a, b, c, d) -> bool:
    """Non-robust edge AB x CD test (edgeutil.rs:96-113)."""
    ab = np.cross(a, b)
    acb = -float(ab @ c)
    bda = float(ab @ d)
    if acb * bda <= 0:
        return False
    cd = np.cross(c, d)
    cbd = -float(cd @ b)
    dac = float(cd @ a)
    return (acb * cbd > 0) and (acb * dac > 0)


def _intersects_lat_edge(a, b, lat: float, lng: SInterval) -> bool:
    # rect.rs:623-673
    z = np.cross(a, b)
    z = z / np.linalg.norm(z)
    if z[2] < 0:
        z = -z
    y = np.cross(z, np.array([0.0, 0.0, 1.0]))
    ny = np.linalg.norm(y)
    if ny == 0:
        return False
    y = y / ny
    x = np.cross(y, z)
    x = x / np.linalg.norm(x)

    sin_lat = math.sin(lat)
    if abs(sin_lat) >= x[2]:
        return False
    cos_theta = sin_lat / x[2]
    sin_theta = math.sqrt(1.0 - cos_theta * cos_theta)
    theta = math.atan2(sin_theta, cos_theta)

    ab_theta = SInterval.from_point_pair(
        math.atan2(float(a @ y), float(a @ x)),
        math.atan2(float(b @ y), float(b @ x)),
    )
    if ab_theta.contains(theta):
        isect = x * cos_theta + y * sin_theta
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    if ab_theta.contains(-theta):
        isect = x * cos_theta - y * sin_theta
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    return False


def _intersects_lng_edge(a, b, lat: RInterval, lng: float) -> bool:
    # rect.rs:675-685: constant-lng edges are geodesics.
    return _simple_crossing(
        a, b, _latlng_point(lat.lo, lng), _latlng_point(lat.hi, lng)
    )
