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

from rust_s2_spark.engine.queries import _tile_quad_areas
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
    cell_sum = float(np.sum(_tile_quad_areas(mask, lvl)))
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
        lat = rng.uniform(rect.lat.lo, rect.lat.hi)
        lo, hi = rect.lng.lo, rect.lng.hi
        if lo <= hi:
            lng = rng.uniform(lo, hi)
        else:
            lng = lo + rng.uniform(0.0, (hi + 2.0 * math.pi) - lo)
            if lng > math.pi:
                lng -= 2.0 * math.pi
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


FAMILIES = {
    "vectorize": fuzz_vectorize,
    "overlay": fuzz_overlay,
    "covering": fuzz_covering,
    "signs": fuzz_signs,
    "serde": fuzz_serde,
    "simplify": fuzz_simplify,
    "edgedist": fuzz_edgedist,
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
            except AssertionError as e:
                failures += 1
                print(f"FAIL {name} seed={seed}: {e}")
        print(
            f"{name}: {args.per_family} seeds, "
            f"{time.time() - t0:.1f}s, failures so far {failures}",
            flush=True,
        )
    print(("CLEAN" if not failures else f"{failures} FAILURES"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
