"""Distributed boundary stitching (engine/vectorize_dist.py) must produce
ring-for-ring the same boundary as the driver-side kernel stitch
(cellunion_boundary), including cross-face rings, holes, and corner-touch
topologies — on random unions, the driver-query masks, and a large covering
where the distributed path is the one that matters."""

from __future__ import annotations

import numpy as np
import pytest

from rust_s2_spark.engine.vectorize_dist import boundary_rings
from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert
from rust_s2_spark.kernel.covering import CellUnion, RegionCoverer
from rust_s2_spark.kernel.region import Cap
from rust_s2_spark.kernel.vectorize import cellunion_boundary


def _kernel_rings(mask, level) -> set:
    """Reference rings from the serial stitch, as a canonical set: each ring
    is the tuple of rounded vertices rotated to start at its min key.
    Polygon.from_oriented_loops re-inverts HOLE loops for storage; undo that
    so the reference carries the stitch's raw interior-left orientation
    (shells CCW, holes CW) — exactly what boundary_rings emits."""
    poly = cellunion_boundary(CellUnion([int(x) for x in mask]), level)
    out = set()
    for lp in poly.loops:
        verts = [tuple(v) for v in lp.vertices]
        if lp.is_hole():
            verts = verts[::-1]
        out.add(_canon(verts))
    return out


def _canon(verts) -> tuple:
    r = [tuple(np.round(np.array(v), 14)) for v in verts]
    rot = min(range(len(r)), key=lambda i: r[i])
    return tuple(r[rot:] + r[:rot])


def _dist_rings(spark, mask, level) -> set:
    df = spark.createDataFrame(
        [(int(np.int64(np.uint64(x))),) for x in mask], "tile long"
    )
    rows = boundary_rings(spark, df, level).collect()
    by_ring: dict = {}
    for r in rows:
        by_ring.setdefault(r["ring_id"], []).append(r)
    out = set()
    for rid, vs in by_ring.items():
        vs.sort(key=lambda r: r["seq"])
        assert [r["seq"] for r in vs] == list(range(len(vs))), rid
        out.add(_canon([(r["x"], r["y"], r["z"]) for r in vs]))
    return out


def _mask_from_points(seed: int, n: int, level: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    la = rng.uniform(-85, 85, n)
    ln = rng.uniform(-180, 180, n)
    return np.unique(h.parent(hilbert.cellid_from_latlng(la, ln), level))


@pytest.mark.parametrize("seed,n,level", [(1, 40, 3), (2, 25, 2), (3, 300, 5), (4, 8, 1)])
def test_random_unions_match_kernel(spark, seed, n, level):
    mask = _mask_from_points(seed, n, level)
    assert _dist_rings(spark, mask, level) == _kernel_rings(mask, level)


def test_driver_query_masks_match_kernel(spark):
    """The exact masks s2_vectorize stitches at sf0.001 (near-global
    occupied footprint with holes + hotspot archipelago)."""
    import duckdb

    from rust_s2_spark.engine import specs

    ids = duckdb.sql(
        "SELECT event_id FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchnumpy()["event_id"].astype(np.int64)
    lat, lng = specs.latlng_np(ids)
    leaf = hilbert.cellid_from_latlng(lat, lng)
    for variant, lvl, hot in specs.VECTORIZE_VARIANTS:
        til = h.parent(leaf, lvl)
        u, c = np.unique(til, return_counts=True)
        mask = u[c >= 2.0 * (c.sum() / len(c))] if hot else u
        assert _dist_rings(spark, mask, lvl) == _kernel_rings(mask, lvl)


def test_corner_touch_at_face_border(spark):
    """Two cells meeting ONLY at a corner that lies exactly on a face border
    — the driver linking must apply the turn rule, not merge the rings."""
    # face 0, level 4: cells at (ti, tj) = (15, 7) and on face 1 across the
    # border diagonal; build from ij directly
    lvl = 4
    size = 1 << (30 - lvl)
    a = h.parent(
        np.uint64(hilbert.cellid_from_face_ij(np.int64(0), np.int64(15 * size), np.int64(7 * size))),
        lvl,
    )
    # the diagonal neighbor across the face edge: edge neighbor of the tile
    # above a, stepped right (gives the cross-face diagonal at the border)
    up = h.edge_neighbors(np.uint64(a))[2]
    diag = h.edge_neighbors(np.uint64(up))[1]
    mask = np.array(sorted({int(a), int(diag)}), dtype=np.uint64)
    assert _dist_rings(spark, mask, lvl) == _kernel_rings(mask, lvl)


def test_large_covering_scale_path(spark):
    """A 30-degree cap covering at level 8 (thousands of cells, guaranteed
    cross-face): the mask size where the distributed path starts to matter.
    Ring parity plus a perimeter sanity bound."""
    cap = Cap.from_latlng_radius(35.0, -40.0, 30.0)
    cu = RegionCoverer(max_cells=100_000, min_level=8, max_level=8).covering(cap)
    flat = CellUnion(list(cu.ids))
    flat.denormalize(8, 1)
    mask = np.array(sorted(int(np.uint64(c)) for c in flat.ids), dtype=np.uint64)
    assert len(mask) > 3000
    got = _dist_rings(spark, mask, 8)
    assert got == _kernel_rings(mask, 8)


def test_parallelism_invariance(spark):
    """Identical ring rows at shuffle.partitions 3 vs 32 — no partition-order
    dependence in the per-face stitch or the driver linking."""
    mask = _mask_from_points(7, 120, 4)
    df = spark.createDataFrame(
        [(int(np.int64(np.uint64(x))),) for x in mask], "tile long"
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, boundary_rings(spark, df.repartition(3), 4).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(tuple, boundary_rings(spark, df.repartition(17), 4).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and len(a) > 0


def test_degenerate_masks(spark):
    """Full sphere (no boundary at all), a single whole face (level-0 cell:
    every vertex is a cube corner, the ring is pure cross-face chains), and
    a single interior cell."""
    # full sphere: all six faces at level 0 -> no boundary edges.  Zero
    # rings would alias FULL with EMPTY (the kernel path returns
    # Loop.full()); the distributed path must refuse loudly instead of
    # returning an empty ring set that reads as the empty polygon.
    faces = [int(np.int64(h.from_face(f))) for f in range(6)]
    df = spark.createDataFrame([(t,) for t in faces], "tile long")
    with pytest.raises(ValueError, match="full sphere"):
        boundary_rings(spark, df, 0)

    # one whole face: one 4-vertex ring, assembled entirely from chains
    one = np.array([np.uint64(np.int64(faces[2]))], dtype=np.uint64)
    assert _dist_rings(spark, one, 0) == _kernel_rings(one, 0)

    # a single interior cell at level 6
    cell = h.parent(hilbert.cellid_from_latlng(np.array([17.0]), np.array([33.0])), 6)
    assert _dist_rings(spark, cell, 6) == _kernel_rings(cell, 6)


@pytest.mark.parametrize("seed,n,level", [(38, 1500, 4), (900, 1500, 4), (68, 300, 3), (21, 1500, 4)])
def test_dense_pinched_masks_match_kernel(spark, seed, n, level):
    """Pinch-heavy dense masks: interior pinches whose pocket crosses a
    face border land in DIFFERENT chains — the face tasks annotate them and
    the driver splits the assembled ring.  Ring-for-ring parity with the
    kernel (these exact masks previously crashed or merged rings)."""
    rng = np.random.default_rng(seed)
    la = rng.uniform(-89, 89, n)
    ln = rng.uniform(-180, 180, n)
    mask = np.unique(h.parent(hilbert.cellid_from_latlng(la, ln), level))
    assert _dist_rings(spark, mask, level) == _kernel_rings(mask, level)


def test_dilate_tiles_matches_kernel(spark):
    """dilate_tiles == tiles ∪ their kernel edge_neighbors (FACE_WRAP
    adjacency included), computed independently in numpy."""
    from rust_s2_spark.engine.vectorize_dist import dilate_tiles

    mask = _mask_from_points(11, 60, 4)
    df = spark.createDataFrame(
        [(int(np.int64(x)),) for x in mask], "tile long"
    )
    got = {r["tile"] for r in dilate_tiles(df, 4).collect()}
    nbrs = np.asarray(h.edge_neighbors(mask), dtype=np.uint64).reshape(-1)
    want = {int(np.int64(x)) for x in np.unique(np.concatenate([mask, nbrs]))}
    assert got == want
    assert len(got) > len(mask)


def test_vectorize_dist_query_vs_numpy(spark):
    """q_s2_vectorize_dist's single row == an independent numpy replay:
    box filter -> fine tiles -> dilation -> boundary edges -> per-edge
    interior-left start corner -> scaled-integer sums.  Pins the oracle's
    combinatorial model to the kernel from a third direction."""
    import duckdb

    from rust_s2_spark.engine import specs
    from rust_s2_spark.engine.queries import QUERIES
    from rust_s2_spark.kernel.vectorize import batched_cell_corners

    row = QUERIES["s2_vectorize_dist"](spark, "/root/testdata/sf0.001").collect()[0]
    ids = duckdb.sql(
        "SELECT event_id FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchnumpy()["event_id"].astype(np.int64)
    lat, lng = specs.latlng_np(ids)
    lat_lo, lat_hi, lng_lo, lng_hi = specs.VECTORIZE_DIST_BOX
    sel = (lat >= lat_lo) & (lat < lat_hi) & (lng >= lng_lo) & (lng < lng_hi)
    lvl = specs.VECTORIZE_DIST_LEVEL
    base = np.unique(h.parent(hilbert.cellid_from_latlng(lat[sel], lng[sel]), lvl))
    nbrs = np.asarray(h.edge_neighbors(base), dtype=np.uint64).reshape(-1)
    mask = np.unique(np.concatenate([base, nbrs]))
    all_nbrs = np.asarray(h.edge_neighbors(mask), dtype=np.uint64)
    outside = ~np.isin(all_nbrs, mask)
    _, corners, _ = batched_cell_corners(mask, lvl)
    starts = corners[outside]  # edge k's start vertex is corner k
    scaled = np.round(starts * specs.VECTORIZE_DIST_SCALE).astype(np.int64)
    assert row["level"] == lvl
    assert row["n_cells"] == len(mask)
    assert row["n_vertices"] == int(outside.sum()) > 0
    assert (row["sx"], row["sy"], row["sz"]) == tuple(scaled.sum(axis=0))


@pytest.mark.parametrize("blocks_level", [1, 3, 4])
def test_block_partitioned_stitch_matches_kernel(spark, blocks_level):
    """Sub-face block partitioning (the 6·4^B-way parallel stitch) is
    ring-for-ring identical to the kernel on a dense pinch-heavy mask —
    including B == cell level, the all-chains extreme where EVERY node is
    a driver-linked cut point."""
    mask = _mask_from_points(38, 1500, 4)
    df = spark.createDataFrame(
        [(int(np.int64(np.uint64(x))),) for x in mask], "tile long"
    )
    rows = boundary_rings(spark, df, 4, blocks_level=blocks_level).collect()
    by_ring: dict = {}
    for r in rows:
        by_ring.setdefault(r["ring_id"], []).append(r)
    got = set()
    for rid, vs in by_ring.items():
        vs.sort(key=lambda r: r["seq"])
        assert [r["seq"] for r in vs] == list(range(len(vs))), rid
        got.add(_canon([(r["x"], r["y"], r["z"]) for r in vs]))
    assert got == _kernel_rings(mask, 4)


def test_block_partitioned_cross_face_and_covering(spark):
    """Blocks + cross-face chains together: the 30° cap covering at level 8
    (thousands of cells across several faces) with a block grid that cuts
    rings at BOTH face borders and block lines."""
    cap = Cap.from_latlng_radius(35.0, -40.0, 30.0)
    cu = RegionCoverer(max_cells=100_000, min_level=8, max_level=8).covering(cap)
    flat = CellUnion(list(cu.ids))
    flat.denormalize(8, 1)
    mask = np.array(sorted(int(np.uint64(c)) for c in flat.ids), dtype=np.uint64)
    df = spark.createDataFrame(
        [(int(np.int64(x)),) for x in mask], "tile long"
    )
    rows = boundary_rings(spark, df, 8, blocks_level=3).collect()
    by_ring: dict = {}
    for r in rows:
        by_ring.setdefault(r["ring_id"], []).append(r)
    got = {
        _canon([(r["x"], r["y"], r["z"]) for r in sorted(vs, key=lambda r: r["seq"])])
        for vs in by_ring.values()
    }
    assert got == _kernel_rings(mask, 8)


def test_full_sphere_mask_raises_loudly(spark):
    """boundary_rings cannot represent the FULL polygon (a full-sphere mask
    has no boundary); it must refuse rather than alias full with empty.
    The kernel path returns Loop.full() for the same input."""
    lvl = 2
    ids = []
    for f in range(6):
        face = CellUnion([int(h.from_face_pos_level(f, 0, 0))])
        face.denormalize(lvl, 1)
        ids.extend(int(np.int64(np.uint64(c))) for c in face.ids)
    assert len(ids) == 6 * 4**lvl
    df = spark.createDataFrame([(x,) for x in ids], "tile long")
    with pytest.raises(ValueError, match="full sphere"):
        boundary_rings(spark, df, lvl)
