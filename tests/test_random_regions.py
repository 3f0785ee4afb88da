"""Cap/rect-sampled randomized property harness (random.rs:10-117 analog).

Seeded generators mirroring the reference's test utilities — random unit
points (random.rs:35-41), caps with log-uniform area (random.rs:23-32),
uniform in-cap samples via the height method (random.rs:94-117), rects from
random latlng pairs (random.rs:47-50) — drive two property suites:

1. kernel: RegionCoverer coverings are COMPLETE (every point of the region
   lands in the covering) and interior coverings are SOUND (every interior
   cell is fully contained), on thousands of random regions the fixed
   NYC/SFO fixtures never visit.
2. engine: the covering-join + chord-refine pipeline (engine/join.cap_join)
   returns exactly the brute-force containment set for seeded random caps
   and point clouds.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert
from rust_s2_spark.kernel.covering import CellUnion, RegionCoverer
from rust_s2_spark.kernel.region import Cap, Cell, Rect

seed_st = st.integers(min_value=0, max_value=2**31 - 1)


# -- seeded generators (random.rs analogs) ----------------------------------


def rand_point(rng) -> np.ndarray:
    """Unit vector from coords uniform in [-1,1)^3 (random.rs:35-41)."""
    while True:
        p = rng.uniform(-1.0, 1.0, 3)
        n = np.linalg.norm(p)
        if n > 1e-3:
            return p / n


def rand_cap(rng, min_area: float, max_area: float) -> Cap:
    """Random axis, log-uniform area (random.rs:23-32)."""
    area = max_area * (min_area / max_area) ** rng.uniform(0.0, 1.0)
    return Cap.from_center_area(rand_point(rng), area)


def sample_point_from_cap(rng, c: Cap) -> np.ndarray:
    """Uniform-by-area point in the cap: random height, random angle on the
    circle at that height (random.rs:94-117)."""
    z = c.center
    # frame at z (random.rs frame_at_point)
    p = rand_point(rng)
    x = np.cross(z, p)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    y /= np.linalg.norm(y)
    hh = rng.uniform(0.0, 1.0) * c.height()
    theta = 2.0 * math.pi * rng.uniform(0.0, 1.0)
    r = math.sqrt(hh * (2.0 - hh))
    v = math.cos(theta) * r * x + math.sin(theta) * r * y + (1.0 - hh) * z
    return v / np.linalg.norm(v)


def rand_rect(rng) -> Rect:
    """Minimal rect spanning two random latlngs (random.rs:47-50)."""
    lls = []
    for _ in range(2):
        p = rand_point(rng)
        lls.append((math.atan2(p[2], math.hypot(p[0], p[1])), math.atan2(p[1], p[0])))
    return Rect.from_point_pair(lls[0][0], lls[0][1], lls[1][0], lls[1][1])


def sample_latlng_from_rect(rng, r: Rect) -> tuple[float, float]:
    """Uniform (in lat x lng coordinate measure) point of the rect,
    handling the inverted (antimeridian-crossing) lng interval."""
    lat = rng.uniform(r.lat.lo, r.lat.hi)
    lo, hi = r.lng.lo, r.lng.hi
    if lo <= hi:
        lng = rng.uniform(lo, hi)
    else:
        lng = lo + rng.uniform(0.0, (hi + 2.0 * math.pi) - lo)
        if lng > math.pi:
            lng -= 2.0 * math.pi
    return lat, lng


def _leaf_of_point(p: np.ndarray) -> int:
    return int(hilbert.cellid_from_xyz(p[0], p[1], p[2]))


# -- kernel properties --------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(seed_st)
def test_cap_covering_complete_and_interior_sound(seed):
    rng = np.random.default_rng(seed)
    cap = rand_cap(rng, 1e-5, 1.0)
    max_cells = int(rng.integers(4, 13))
    coverer = RegionCoverer(max_cells=max_cells)
    cov = coverer.covering(cap)
    assert cov.ids == sorted(cov.ids)
    # completeness: every in-cap sample's leaf id is inside the covering
    leaves = np.array(
        [_leaf_of_point(sample_point_from_cap(rng, cap)) for _ in range(40)],
        dtype=np.uint64,
    )
    inside = cov.contains_points(leaves)
    assert inside.all(), f"covering missed {int((~inside).sum())}/40 in-cap points"
    # soundness of the interior covering: each cell fully inside the cap
    for cid in coverer.interior_covering(cap).ids:
        assert cap.contains_cell(Cell(cid))


@settings(max_examples=60, deadline=None)
@given(seed_st)
def test_rect_covering_complete(seed):
    rng = np.random.default_rng(seed)
    rect = rand_rect(rng)
    if rect.is_empty:
        return
    coverer = RegionCoverer(max_cells=int(rng.integers(4, 13)))
    cov = coverer.covering(rect)
    leaves = []
    for _ in range(40):
        lat, lng = sample_latlng_from_rect(rng, rect)
        leaves.append(int(hilbert.cellid_from_latlng(math.degrees(lat), math.degrees(lng))))
    inside = cov.contains_points(np.array(leaves, dtype=np.uint64))
    assert inside.all(), f"covering missed {int((~inside).sum())}/40 in-rect points"


@settings(max_examples=40, deadline=None)
@given(seed_st)
def test_covering_union_contains_region_cells(seed):
    """CellUnion set relations on random coverings: the covering of a
    sub-cap is covered by the expanded covering relations — here pinned
    as: every covering cell INTERSECTS the cap (no wasted cells beyond
    the coverer's level floor), and normalize() idempotence."""
    rng = np.random.default_rng(seed)
    cap = rand_cap(rng, 1e-4, 0.5)
    cov = RegionCoverer(max_cells=8).covering(cap)
    for cid in cov.ids:
        assert cap.intersects_cell(Cell(cid))
    again = CellUnion(list(cov.ids))
    assert again.ids == cov.ids  # already normalized


# -- engine end-to-end: covering join == brute force --------------------------


pytestmark_spark = pytest.mark.spark


@pytest.mark.spark
def test_cap_join_matches_brute_force_on_random_clouds(spark):
    """Seeded random caps + mixed point cloud (background sphere points and
    guaranteed in-cap samples) through the production cap_join (covering
    prefilter + JVM chord refine) must equal numpy brute force exactly."""
    from pyspark.sql import functions as F

    from rust_s2_spark.engine import tiling
    from rust_s2_spark.engine.join import cap_join
    from rust_s2_spark.engine.queries import _COVER_SCHEMA, _cov_rows_for

    rng = np.random.default_rng(20260818)
    caps = [rand_cap(rng, 1e-3, 0.2) for _ in range(5)]

    pts = [rand_point(rng) for _ in range(1200)]
    for c in caps:
        pts.extend(sample_point_from_cap(rng, c) for _ in range(60))
    lat = np.degrees(np.arctan2([p[2] for p in pts], np.hypot([p[0] for p in pts], [p[1] for p in pts])))
    lng = np.degrees(np.arctan2([p[1] for p in pts], [p[0] for p in pts]))

    docs = spark.createDataFrame(
        [(i, float(lat[i]), float(lng[i])) for i in range(len(pts))],
        "doc_id long, lat double, lng double",
    )
    docs = tiling.with_leaf_cellid(docs)

    regions = spark.createDataFrame(
        [
            (f"cap{k}", float(c.center[0]), float(c.center[1]), float(c.center[2]), c.radius2)
            for k, c in enumerate(caps)
        ],
        "region_id string, cx double, cy double, cz double, radius2 double",
    )
    coverer = RegionCoverer(max_cells=12)
    cov_rows = []
    for k, c in enumerate(caps):
        cov_rows.extend(_cov_rows_for(f"cap{k}", coverer.covering(c).ids))
    coverings = spark.createDataFrame(cov_rows, _COVER_SCHEMA)
    levels = sorted({r[2] for r in cov_rows})

    got = {
        (r["region_id"], r["doc_id"])
        for r in cap_join(docs, regions, coverings, id_col="doc_id", levels=levels)
        .select("region_id", "doc_id")
        .collect()
    }

    # brute force: the same spherical coords the engine's refine consumes
    # (degrees -> radians -> xyz), chord-squared compare
    la, ln = np.radians(lat), np.radians(lng)
    xyz = np.stack([np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)], axis=1)
    want = set()
    for k, c in enumerate(caps):
        d2 = ((xyz - c.center[None, :]) ** 2).sum(axis=1)
        for i in np.nonzero(d2 <= c.radius2)[0]:
            want.add((f"cap{k}", int(i)))
    assert got == want
    # non-vacuous: each cap caught at least its own samples
    assert all(any(rid == f"cap{k}" for rid, _ in want) for k in range(len(caps)))


# -- raster<->vector property suite ------------------------------------------


@settings(max_examples=40, deadline=None)
@given(seed=seed_st, lvl=st.integers(min_value=2, max_value=6))
def test_vectorize_invariants_on_random_unions(seed, lvl):
    """cellunion_boundary on a random level-``lvl`` cell set: stitched vertex
    count equals the boundary-edge count from edge-neighbor membership, the
    polygon's area equals the exact cell-area sum, and membership round-trips
    on random probe points (incl. cross-face and corner-touching sets the
    fixed fixtures never produce)."""
    from rust_s2_spark.kernel.vectorize import cellunion_boundary

    rng = np.random.default_rng(seed)
    n_pts = int(rng.integers(3, 60))
    pts = np.stack([rand_point(rng) for _ in range(n_pts)])
    la = np.degrees(np.arctan2(pts[:, 2], np.hypot(pts[:, 0], pts[:, 1])))
    ln = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    mask = np.unique(h.parent(hilbert.cellid_from_latlng(la, ln), lvl))
    in_set = {int(x) for x in mask}
    poly = cellunion_boundary(CellUnion([int(x) for x in mask]), lvl)
    nbrs = np.asarray(h.edge_neighbors(mask), dtype=np.uint64)
    n_bd = int(sum(int(x) not in in_set for x in nbrs.ravel()))
    assert sum(len(lp.vertices) for lp in poly.loops) == n_bd
    cell_sum = sum(Cell(int(c)).exact_area() for c in mask)
    assert abs(poly.area() - cell_sum) < 1e-10 * max(1.0, cell_sum)
    # membership roundtrip on fresh random probes (off cell boundaries wpo 1)
    for _ in range(40):
        p = rand_point(rng)
        pla = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
        pln = math.degrees(math.atan2(p[1], p[0]))
        tile = int(h.parent(hilbert.cellid_from_latlng(pla, pln), lvl))
        assert poly.contains_point(p) == (tile in in_set)
