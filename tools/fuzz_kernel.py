"""Extended-seed kernel fuzzer — the same exact invariants the pytest
suites gate on bounded example counts, runnable for thousands of fresh
seeds (no Spark, pure kernel, ~10-40 ms/case per family).

Families (each asserts EXACT invariants, no tolerances beyond the ones the
tests already justify):

  vectorize  dense random masks -> cellunion_boundary: boundary-edge count
             == vertex count, no repeated vertex in any loop, polygon area
             == exact sum of cell quad areas, membership round-trip at
             random probe cells (tests/test_vectorize.py dense-mask gate).
  overlay    random regular-loop pairs: union/intersection/difference area
             identities + membership algebra at both centers
             (tests/test_overlay.py fuzz gate).
  covering   random caps/rects: covering completeness at in-region samples,
             interior-covering soundness (tests/test_random_regions.py,
             the random.rs:10-117 analog).
  signs      robust_sign vs exact_sign (Fraction path) on NEAR-DEGENERATE
             triples: c = a + eps*(b-a) + tiny noise, eps spanning 1e-18 ..
             1e-6 — the triage/stable bands where a wrong fast-path answer
             would corrupt every loop relation.
  serde      loop_encode/decode lossless round-trip on random regular
             loops (vertices bit-identical, origin_inside preserved).
  intersect  robust edge intersection at random crossing angles down to
             1e-12 rad: exact-arithmetic great-circle distance of the
             computed point to BOTH edges <= INTERSECTION_ERROR, segment
             proximity <= 1e-12, angle to the exact intersection <=
             INTERSECTION_ERROR (tests/test_edge_intersection.py harness,
             randomized slopes).
  wraps      Hilbert-curve wrap algebra on random cells at random levels:
             advance_wrap(x,k) then (x',-k) round-trips, next/prev_wrap
             are inverses and equal advance_wrap(+-1), a full lap of
             6*4^level steps is the identity, level is preserved, and
             advance == advance_wrap when no clamp/wrap applies.
  polycover  RegionCoverer over multi-loop polygons (shell + hole):
             covering completeness at annulus samples, hole samples
             excluded from the region, interior-covering soundness via
             Polygon.contains_cell.
  clipface   face_segments chain contract on random sphere edges: first/
             last endpoints match A/B, consecutive segments share border
             endpoints, every endpoint lies on the edge's great circle
             and inside the face square (tests/test_clipping.py).
  rectdist   Rect.distance_to_latlng_rad: zero iff the rect contains the
             point, and a true lower bound on the arc distance to every
             sampled in-rect point.

Usage: python tools/fuzz_kernel.py [--per-family N] [--base-seed B]
Exit 0 = all seeds clean; any failure prints the family + seed and exits 1.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from fractions import Fraction

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rust_s2_spark.kernel.vectorize import tile_quad_areas
from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert
from rust_s2_spark.kernel.covering import CellUnion, RegionCoverer
from rust_s2_spark.kernel.overlay import (
    loop_difference,
    loop_intersection,
    loop_union,
)
from rust_s2_spark.kernel.pip import exact_sign, regular_loop, robust_sign
from rust_s2_spark.kernel.region import Cap, Cell, Rect, _latlng_point
from rust_s2_spark.kernel.serde import loop_decode, loop_encode
from rust_s2_spark.kernel.vectorize import cellunion_boundary


def _rand_point(rng) -> np.ndarray:
    while True:
        p = rng.uniform(-1.0, 1.0, 3)
        n = np.linalg.norm(p)
        if n > 1e-3:
            return p / n


def _sample_latlng_in_rect(rng, rect) -> tuple[float, float]:
    """Uniform (lat, lng) radians inside ``rect``, handling the inverted
    (antimeridian-wrapping) longitude interval."""
    lat = rng.uniform(rect.lat.lo, rect.lat.hi)
    lo, hi = rect.lng.lo, rect.lng.hi
    if lo <= hi:
        lng = rng.uniform(lo, hi)
    else:
        lng = lo + rng.uniform(0.0, (hi + 2.0 * math.pi) - lo)
        if lng > math.pi:
            lng -= 2.0 * math.pi
    return lat, lng


# -- families -----------------------------------------------------------------


def fuzz_vectorize(rng) -> None:
    lvl = int(rng.integers(2, 6))
    n = int(rng.integers(30, 1200))
    la = rng.uniform(-89, 89, n)
    ln = rng.uniform(-180, 180, n)
    mask = np.unique(h.parent(hilbert.cellid_from_latlng(la, ln), lvl))
    in_set = {int(x) for x in mask}
    nbrs = np.asarray(h.edge_neighbors(mask), dtype=np.uint64)
    n_bd = int(sum(int(x) not in in_set for x in nbrs.ravel()))
    poly = cellunion_boundary(CellUnion([int(x) for x in mask]), lvl)
    if n_bd == 0:
        # mask covers the whole sphere -> the FULL polygon (sentinel loop)
        assert len(mask) == 6 * 4**lvl, "no boundary but not full"
        assert poly.is_full(), "full-sphere union must vectorize to FULL"
    else:
        assert (
            sum(len(lp.vertices) for lp in poly.loops) == n_bd
        ), "vertex-count identity"
        for lp in poly.loops:
            keys = [tuple(np.round(v, 14)) for v in lp.vertices]
            assert len(set(keys)) == len(keys), "repeated vertex in a loop"
    cell_sum = float(np.sum(tile_quad_areas(mask, lvl)))
    assert abs(poly.area() - cell_sum) < 1e-10 * max(1.0, cell_sum), "area identity"
    la2 = rng.uniform(-85, 85, 60)
    ln2 = rng.uniform(-179, 179, 60)
    probes = h.parent(hilbert.cellid_from_latlng(la2, ln2), lvl)
    for t in range(60):
        p = _latlng_point(math.radians(la2[t]), math.radians(ln2[t]))
        assert poly.contains_point(p) == (int(probes[t]) in in_set), "membership"


def fuzz_overlay(rng) -> None:
    if rng.uniform() < 0.25:
        # BIG loops, near-antipodal centers: exercises the
        # complementary-overlap branch (disjoint boundaries, union = FULL
        # sphere) that small radii can never reach
        ca = _rand_point(rng)
        cb = -ca + rng.normal(0.0, 0.15, 3)
        cb /= np.linalg.norm(cb)
        ra, rb = rng.uniform(95, 135), rng.uniform(95, 135)
    else:
        lat_a, lng_a = rng.uniform(-60, 60), rng.uniform(-150, 150)
        ca = _latlng_point(math.radians(lat_a), math.radians(lng_a))
        cb = _latlng_point(
            math.radians(lat_a + rng.uniform(-8, 8)),
            math.radians(lng_a + rng.uniform(-8, 8)),
        )
        ra, rb = rng.uniform(1, 7), rng.uniform(1, 7)
    a = regular_loop(ca, math.radians(ra), int(rng.integers(6, 24)))
    b = regular_loop(cb, math.radians(rb), int(rng.integers(6, 24)))
    try:
        u = loop_union(a, b)
        i = loop_intersection(a, b)
        d = loop_difference(a, b)
    except ValueError:
        return  # degenerate shared-boundary case, legitimately rejected
    assert abs(u.area() + i.area() - (a.area() + b.area())) < 1e-10, "U+I area"
    assert abs(d.area() - (a.area() - i.area())) < 1e-10, "D area"
    for c in [ca, cb] + [_rand_point(rng) for _ in range(10)]:
        ia, ib = a.contains_point(c), b.contains_point(c)
        assert u.contains_point(c) == (ia or ib), "union membership"
        assert i.contains_point(c) == (ia and ib), "intersection membership"
        assert d.contains_point(c) == (ia and not ib), "difference membership"


def fuzz_covering(rng) -> None:
    # cap: log-uniform area
    area = 1.0 * (1e-5 / 1.0) ** rng.uniform(0.0, 1.0)
    cap = Cap.from_center_area(_rand_point(rng), area)
    coverer = RegionCoverer(max_cells=int(rng.integers(4, 13)))
    cov = coverer.covering(cap)
    assert cov.ids == sorted(cov.ids), "covering normalized"
    z = cap.center
    p = _rand_point(rng)
    x = np.cross(z, p)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    leaves = []
    for _ in range(30):
        hh = rng.uniform(0.0, 1.0) * cap.height()
        th = 2.0 * math.pi * rng.uniform(0.0, 1.0)
        r = math.sqrt(hh * (2.0 - hh))
        v = math.cos(th) * r * x + math.sin(th) * r * y + (1.0 - hh) * z
        v /= np.linalg.norm(v)
        leaves.append(int(hilbert.cellid_from_xyz(v[0], v[1], v[2])))
    assert cov.contains_points(np.array(leaves, dtype=np.uint64)).all(), "cap complete"
    for cid in coverer.interior_covering(cap).ids:
        assert cap.contains_cell(Cell(cid)), "interior soundness"
    # rect completeness
    lls = []
    for _ in range(2):
        q = _rand_point(rng)
        lls.append((math.atan2(q[2], math.hypot(q[0], q[1])), math.atan2(q[1], q[0])))
    rect = Rect.from_point_pair(lls[0][0], lls[0][1], lls[1][0], lls[1][1])
    if rect.is_empty:
        return
    rcov = RegionCoverer(max_cells=int(rng.integers(4, 13))).covering(rect)
    leaves = []
    for _ in range(30):
        lat, lng = _sample_latlng_in_rect(rng, rect)
        leaves.append(
            int(hilbert.cellid_from_latlng(math.degrees(lat), math.degrees(lng)))
        )
    assert rcov.contains_points(np.array(leaves, dtype=np.uint64)).all(), "rect complete"


def _sign_fraction(a, b, c) -> int:
    ax, ay, az = (Fraction(float(v)) for v in a)
    bx, by, bz = (Fraction(float(v)) for v in b)
    cx, cy, cz = (Fraction(float(v)) for v in c)
    det = (
        (bx * cy - by * cx) * az
        + (by * cz - bz * cy) * ax
        + (bz * cx - bx * cz) * ay
    )
    return (det > 0) - (det < 0)


def fuzz_signs(rng) -> None:
    a = _rand_point(rng)
    b = _rand_point(rng)
    for _ in range(20):
        eps = 10.0 ** rng.uniform(-18, -6)
        t = rng.uniform(0.1, 0.9)
        c = a + t * (b - a) + eps * rng.uniform(-1.0, 1.0, 3)
        c /= np.linalg.norm(c)
        got = robust_sign(a, b, c)
        want = _sign_fraction(a, b, c)
        if want != 0:
            assert got == want, f"robust_sign {got} != exact {want} (eps={eps})"
        else:
            # exactly-collinear floats: robust_sign must match the
            # symbolically-perturbed exact path, never return 0
            assert got == exact_sign(a, b, c, perturb=True), "perturbed tie"
            assert got != 0, "robust_sign returned 0"


def fuzz_serde(rng) -> None:
    c = _rand_point(rng)
    lp = regular_loop(c, math.radians(rng.uniform(0.5, 40)), int(rng.integers(3, 64)))
    back = loop_decode(loop_encode(lp))
    assert back.vertices.shape == lp.vertices.shape, "vertex shape"
    assert (back.vertices == lp.vertices).all(), "vertices not bit-identical"
    assert back.origin_inside == lp.origin_inside, "origin_inside flag"


def fuzz_simplify(rng) -> None:
    from rust_s2_spark.kernel.edgeutil import distance_from_segment
    from rust_s2_spark.kernel.simplify import simplify_points

    # random walk polyline on the sphere
    n = int(rng.integers(4, 120))
    p = _rand_point(rng)
    pts = [p]
    for _ in range(n - 1):
        step = rng.normal(0.0, math.radians(rng.uniform(0.05, 3.0)), 3)
        q = pts[-1] + step
        pts.append(q / np.linalg.norm(q))
    pts = np.asarray(pts)
    tol = math.radians(rng.uniform(0.01, 5.0))
    out = pts[simplify_points(pts, tol)]  # returns kept indices
    # endpoints preserved, order preserved (subset), and every dropped
    # vertex within tol of the simplified chain (the DP guarantee)
    assert (out[0] == pts[0]).all() and (out[-1] == pts[-1]).all(), "endpoints"
    keys = {tuple(v) for v in out}
    kept_idx = [i for i, v in enumerate(pts) if tuple(v) in keys]
    assert len(kept_idx) == len(out), "output must be a subsequence"
    seg = 0
    for i, v in enumerate(pts):
        while seg < len(kept_idx) - 2 and i >= kept_idx[seg + 1]:
            seg += 1
        a, b = out[seg], out[seg + 1]
        d = float(distance_from_segment(v.reshape(1, 3), a, b)[0])
        assert d <= tol + 1e-12, f"dropped vertex {d} > tol {tol}"


def fuzz_edgedist(rng) -> None:
    from rust_s2_spark.kernel.edgeutil import (
        closest_point_on_segment,
        distance_from_segment,
    )

    a = _rand_point(rng)
    b = _rand_point(rng)
    if abs(np.dot(a, b)) > 1 - 1e-12:
        return
    x = _rand_point(rng)
    d = float(distance_from_segment(x.reshape(1, 3), a, b)[0])
    c = closest_point_on_segment(x.reshape(1, 3), a, b)[0]
    d_c = math.acos(max(-1.0, min(1.0, float(np.dot(x, c)))))
    assert abs(d - d_c) < 1e-9, "closest point disagrees with distance"
    # no interpolated point on the edge is closer than the reported min
    for t in rng.uniform(0.0, 1.0, 25):
        m = a + t * (b - a)
        m /= np.linalg.norm(m)
        dm = math.acos(max(-1.0, min(1.0, float(np.dot(x, m)))))
        assert dm >= d - 1e-9, "interior point beats reported min distance"


def fuzz_intersect(rng) -> None:
    from fractions import Fraction as _Fr

    from rust_s2_spark.kernel.edgeutil import distance_from_segment
    from rust_s2_spark.kernel.pip import (
        INTERSECTION_ERROR,
        EdgeCrosser,
        edge_intersection,
        intersection_exact,
    )

    def _n(v):
        v = np.asarray(v, dtype=np.float64)
        return v / np.linalg.norm(v)

    def _ang(p, q):
        return math.atan2(np.linalg.norm(np.cross(p, q)), float(p @ q))

    def _exact_circle_dist(x, e0, e1):
        f0 = [_Fr(float(v)) for v in e0]
        f1 = [_Fr(float(v)) for v in e1]
        nrm = (
            f0[1] * f1[2] - f0[2] * f1[1],
            f0[2] * f1[0] - f0[0] * f1[2],
            f0[0] * f1[1] - f0[1] * f1[0],
        )
        fx = [_Fr(float(v)) for v in x]
        dot = sum(q * w for q, w in zip(fx, nrm))
        nn = math.sqrt(float(sum(v * v for v in nrm)))
        return abs(float(dot)) / nn

    dbl_eps = 2.220446049250313e-16
    z = _n(rng.normal(size=3))
    x = _n(np.cross(z, rng.normal(size=3)))
    y = np.cross(z, x)
    slope = 10.0 ** rng.uniform(-12, -1)
    p = z
    d1 = _n(x + slope * y)
    d2 = _n(x - slope * y)
    for _tries in range(200):
        ab_len = math.pi * 10.0 ** rng.uniform(-4, -0.3)
        cd_len = math.pi * 10.0 ** rng.uniform(-4, -0.3)
        a_fr = rng.uniform()
        c_fr = rng.uniform()
        # near-endpoint stress: endpoint an ABSOLUTE 1-1e4 ulps from the
        # crossing (a_fr is a fraction of ab_len, so divide by the length)
        if rng.uniform() < 0.25:
            a_fr = min(0.5, dbl_eps * 10.0 ** rng.uniform(0, 4) / ab_len)
        if rng.uniform() < 0.25:
            c_fr = min(0.5, dbl_eps * 10.0 ** rng.uniform(0, 4) / cd_len)
        a = _n(p - d1 * (a_fr * ab_len))
        b = _n(p + d1 * ((1 - a_fr) * ab_len))
        c = _n(p - d2 * (c_fr * cd_len))
        d = _n(p + d2 * ((1 - c_fr) * cd_len))
        if EdgeCrosser(a, b).crossing_sign(c, d) > 0:
            break
    else:
        return  # no crossing pair drawn for this seed — vacuous
    expected = intersection_exact(a, b, c, d)
    if float(expected @ (a + b + c + d)) < 0:
        expected = -expected
    actual = edge_intersection(a, b, c, d)
    for e0, e1 in ((a, b), (c, d)):
        assert _exact_circle_dist(actual, e0, e1) <= INTERSECTION_ERROR, "circle dist"
    assert distance_from_segment(actual, a, b)[0] <= 1e-12, "segment AB"
    assert distance_from_segment(actual, c, d)[0] <= 1e-12, "segment CD"
    assert _ang(actual, expected) <= INTERSECTION_ERROR, "vs exact point"
    # swap/reversal invariance within the error bound
    for args in ((b, a, d, c), (c, d, a, b)):
        assert _ang(edge_intersection(*args), actual) <= 2 * INTERSECTION_ERROR, "swap"


def fuzz_wraps(rng) -> None:
    lvl = int(rng.integers(0, 31))
    la, ln = rng.uniform(-89.9, 89.9), rng.uniform(-180.0, 180.0)
    cid = h.parent(hilbert.cellid_from_latlng(la, ln), lvl)
    total = 6 * 4**lvl
    assert int(h.level(cid)) == lvl, "level decode"
    # next/prev are inverses and match advance_wrap(+-1)
    assert int(h.prev_wrap(h.next_wrap(cid))) == int(cid), "prev(next)"
    assert int(h.next_wrap(h.prev_wrap(cid))) == int(cid), "next(prev)"
    assert int(h.advance_wrap(cid, 1)) == int(h.next_wrap(cid)), "advance +1"
    assert int(h.advance_wrap(cid, -1)) == int(h.prev_wrap(cid)), "advance -1"
    # round-trip with arbitrary (possibly > one-lap) step counts
    for _ in range(8):
        k = int(rng.integers(-3 * total, 3 * total + 1)) if total < 2**40 else int(
            rng.integers(-(2**40), 2**40)
        )
        fwd = h.advance_wrap(cid, k)
        assert int(h.level(fwd)) == lvl, "advance_wrap level"
        assert int(h.advance_wrap(fwd, -k)) == int(cid), "advance_wrap round-trip"
    # one full lap is the identity
    if total < 2**40:
        assert int(h.advance_wrap(cid, total)) == int(cid), "full lap"
        assert int(h.advance_wrap(cid, -total)) == int(cid), "full reverse lap"
    # advance (clamped) agrees with advance_wrap when no wrap occurs
    dist = int(h.distance_from_begin(cid))
    small = int(rng.integers(0, 5))
    if dist >= small:
        assert int(h.advance(cid, -small)) == int(
            h.advance_wrap(cid, -small)
        ), "advance == advance_wrap (no wrap)"


def fuzz_polycover(rng) -> None:
    from rust_s2_spark.kernel.pip import Loop, Polygon

    c = _rand_point(rng)
    r_out = math.radians(rng.uniform(4.0, 25.0))
    r_in = r_out * rng.uniform(0.2, 0.7)
    n_shell = int(rng.integers(8, 32))
    n_hole = int(rng.integers(8, 32))
    shell = regular_loop(c, r_out, n_shell)
    hole = regular_loop(c, r_in, n_hole)
    poly = Polygon.from_loops([shell, hole])
    cov = RegionCoverer(max_cells=int(rng.integers(8, 17))).covering(poly)
    # orthonormal frame around c for sampling at a given angular distance
    x = np.cross(c, _rand_point(rng))
    x /= np.linalg.norm(x)
    y = np.cross(c, x)
    # polygon area: shell minus hole (regular loops are convex, hole nests)
    assert abs(poly.area() - (shell.area() - hole.area())) < 1e-10, "annulus area"
    # regular_loop vertices lie ON their circle, so each loop sits inside its
    # circumcircle and contains its inscribed circle (radius r*cos(pi/n)).
    in_ins = r_in * math.cos(math.pi / n_hole)  # hole's inscribed radius
    out_ins = r_out * math.cos(math.pi / n_shell)
    for _ in range(40):
        t = rng.uniform(0.0, r_out)
        th = rng.uniform(0.0, 2 * math.pi)
        v = math.sin(t) * (math.cos(th) * x + math.sin(th) * y) + math.cos(t) * c
        v /= np.linalg.norm(v)
        inside = poly.contains_point(v)
        if inside:
            # completeness: every region point must be covered
            leaf = int(hilbert.cellid_from_xyz(v[0], v[1], v[2]))
            assert cov.contains_points(np.array([leaf], dtype=np.uint64)).all(), (
                "covering misses an interior point"
            )
        if t < in_ins * 0.999:
            assert not inside, "hole interior point inside polygon"
        if r_in <= t <= out_ins * 0.999 and t >= r_in * 1.001:
            assert inside, "annulus point outside polygon"
    for cid in RegionCoverer(max_cells=12).interior_covering(poly).ids:
        assert poly.contains_cell(Cell(cid)), "interior covering soundness"


def fuzz_clipface(rng) -> None:
    from rust_s2_spark.kernel import clipping, stuv

    a = _rand_point(rng)
    b = _rand_point(rng)
    if abs(float(a @ b)) > 1 - 1e-9:
        return
    segs = clipping.face_segments(a, b)
    assert 1 <= len(segs) <= 5, "segment count"
    nrm = np.cross(a, b)
    nn = np.linalg.norm(nrm)
    if nn < 1e-9:
        return
    nrm = nrm / nn
    pts = []
    for face, (au, av), (bu, bv) in segs:
        pa = np.asarray(stuv.face_uv_to_xyz(face, au, av), dtype=np.float64)
        pb = np.asarray(stuv.face_uv_to_xyz(face, bu, bv), dtype=np.float64)
        pa /= np.linalg.norm(pa)
        pb /= np.linalg.norm(pb)
        pts.append((pa, pb))
        for u, v in ((au, av), (bu, bv)):
            assert abs(u) <= 1 + 1e-12 and abs(v) <= 1 + 1e-12, "uv in face square"
        for p in (pa, pb):
            assert abs(float(p @ nrm)) < 1e-10, "endpoint on great circle"
    assert np.linalg.norm(pts[0][0] - a) < 1e-12, "starts at A"
    assert np.linalg.norm(pts[-1][1] - b) < 1e-12, "ends at B"
    for i in range(len(pts) - 1):
        assert np.linalg.norm(pts[i][1] - pts[i + 1][0]) < 1e-12, "chain continuity"


def fuzz_rectdist(rng) -> None:
    lls = []
    for _ in range(2):
        q = _rand_point(rng)
        lls.append((math.atan2(q[2], math.hypot(q[0], q[1])), math.atan2(q[1], q[0])))
    rect = Rect.from_point_pair(lls[0][0], lls[0][1], lls[1][0], lls[1][1])
    if rect.is_empty:
        return
    for _ in range(10):
        q = _rand_point(rng)
        lat = math.atan2(q[2], math.hypot(q[0], q[1]))
        lng = math.atan2(q[1], q[0])
        d = rect.distance_to_latlng_rad(lat, lng)
        assert d >= 0.0, "negative distance"
        inside = rect.contains_latlng_rad(lat, lng)
        assert (d == 0.0) == inside, "zero iff contained"
        # d is a lower bound on the distance to every in-rect sample
        p = _latlng_point(lat, lng)
        for _s in range(12):
            slat, slng = _sample_latlng_in_rect(rng, rect)
            s = _latlng_point(slat, slng)
            ds = math.atan2(np.linalg.norm(np.cross(p, s)), float(p @ s))
            assert ds >= d - 1e-12, "sample beats claimed min distance"


FAMILIES = {
    "vectorize": fuzz_vectorize,
    "overlay": fuzz_overlay,
    "covering": fuzz_covering,
    "signs": fuzz_signs,
    "serde": fuzz_serde,
    "simplify": fuzz_simplify,
    "edgedist": fuzz_edgedist,
    "intersect": fuzz_intersect,
    "wraps": fuzz_wraps,
    "polycover": fuzz_polycover,
    "clipface": fuzz_clipface,
    "rectdist": fuzz_rectdist,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-family", type=int, default=200)
    ap.add_argument("--base-seed", type=int, default=0)
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args()
    failures = 0
    for name in args.families.split(","):
        fn = FAMILIES[name]
        t0 = time.time()
        for k in range(args.per_family):
            seed = args.base_seed + k
            try:
                fn(np.random.default_rng(seed))
            except Exception as e:  # a crash is a finding too (_rect_is_full
                # was a TypeError) — record it and keep sweeping
                failures += 1
                print(f"FAIL {name} seed={seed}: {type(e).__name__}: {e}")
        print(
            f"{name}: {args.per_family} seeds, "
            f"{time.time() - t0:.1f}s, failures so far {failures}",
            flush=True,
        )
    print(("CLEAN" if not failures else f"{failures} FAILURES"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
