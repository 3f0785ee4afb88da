"""CellUnion -> boundary Polygon vectorization (kernel/vectorize.py).

Invariants: the polygon's area equals the exact sum of the cell areas
(identical region), membership matches union membership for probe points,
and removed interior cells produce holes.
"""

from __future__ import annotations

import math

import numpy as np

from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert
from rust_s2_spark.kernel.covering import CellUnion, RegionCoverer
from rust_s2_spark.kernel.region import Cap, Cell, _latlng_point
from rust_s2_spark.kernel.vectorize import cellunion_boundary


def _flat(cu, lvl):
    flat = CellUnion(list(cu.ids))
    flat.denormalize(lvl, 1)
    return flat


def test_cap_covering_roundtrip():
    cap = Cap.from_latlng_radius(40.0, -100.0, 4.0)
    cu = RegionCoverer(max_cells=24, max_level=7).covering(cap)
    lvl = max(int(h.level(np.uint64(c))) for c in cu.ids)
    poly = cellunion_boundary(cu, lvl)
    assert poly.num_loops() == 1
    flat = _flat(cu, lvl)
    want_area = sum(Cell(c).exact_area() for c in flat.ids)
    assert abs(poly.area() - want_area) < 1e-12
    rng = np.random.default_rng(5)
    for _ in range(500):
        la = 40 + rng.uniform(-6, 6)
        ln = -100 + rng.uniform(-8, 8)
        p = _latlng_point(math.radians(la), math.radians(ln))
        leaf = int(hilbert.cellid_from_latlng(la, ln))
        assert cu.contains_cellid(leaf) == poly.contains_point(p)


def test_hole_from_removed_cells():
    cap = Cap.from_latlng_radius(10.0, 10.0, 3.0)
    cu = RegionCoverer(max_cells=16, max_level=6).covering(cap)
    lvl = max(int(h.level(np.uint64(c))) for c in cu.ids)
    flat = _flat(cu, lvl)
    center_leaf = np.uint64(hilbert.cellid_from_latlng(10.0, 10.0))
    center_cell = int(h.parent(center_leaf, lvl))
    assert center_cell in flat.ids
    ring = CellUnion([c for c in flat.ids if c != center_cell])
    poly = cellunion_boundary(ring, lvl)
    depths = sorted(lp.depth for lp in poly.loops)
    assert depths == [0, 1]  # shell + hole
    assert not poly.contains_point(_latlng_point(math.radians(10), math.radians(10)))
    want_area = sum(Cell(c).exact_area() for c in ring.ids)
    assert abs(poly.area() - want_area) < 1e-12


def test_two_components():
    a = RegionCoverer(max_cells=8, max_level=6).covering(
        Cap.from_latlng_radius(0.0, 0.0, 2.0)
    )
    b = RegionCoverer(max_cells=8, max_level=6).covering(
        Cap.from_latlng_radius(30.0, 60.0, 2.0)
    )
    lvl = max(int(h.level(np.uint64(c))) for c in list(a.ids) + list(b.ids))
    both = CellUnion(list(a.ids) + list(b.ids))
    both.normalize()
    poly = cellunion_boundary(both, lvl)
    assert poly.num_loops() >= 2
    assert all(lp.depth == 0 for lp in poly.loops)  # disjoint shells


def test_single_cell():
    cid = int(h.from_face_pos_level(2, 123, 5))
    poly = cellunion_boundary(CellUnion([cid]), 5)
    assert poly.num_loops() == 1
    assert len(poly.loops[0].vertices) == 4
    assert abs(poly.area() - Cell(cid).exact_area()) < 1e-15


def test_empty_union():
    assert cellunion_boundary(CellUnion([]), 5).is_empty()


def test_full_sphere_union_is_full_polygon():
    """A mask covering every cell has no boundary — that is the FULL
    polygon (area 4*pi, contains everything), not the empty one.  Found by
    tools/fuzz_kernel.py (seed 14 at level 2): dense random point sets
    routinely saturate the 96-cell level-2 grid."""
    import math

    lvl = 2
    ids = [int(h.from_face_pos_level(f, 0, 0)) for f in range(6)]
    cu = CellUnion(ids)  # six face cells; denormalize expands to level 2
    poly = cellunion_boundary(cu, lvl)
    assert poly.is_full()
    assert abs(poly.area() - 4 * math.pi) < 1e-12
    assert poly.contains_point(np.array([0.0, 0.0, 1.0]))
    assert poly.contains_point(np.array([0.0, 0.0, -1.0]))


def test_raster_vector_roundtrip_with_overlay():
    """Loop -> covering (raster) -> boundary polygon (vector) -> overlay
    comparison: the vectorized covering is a superset of the region, and
    the IoU (computed with the boolean overlay kernel) is high."""
    import math

    from rust_s2_spark.kernel.overlay import polygon_intersection, polygon_union
    from rust_s2_spark.kernel.pip import Polygon, regular_loop

    center = _latlng_point(math.radians(20), math.radians(30))
    ring = regular_loop(center, math.radians(5), 24)
    region = Polygon.from_loops([ring])
    cu = RegionCoverer(max_cells=64, max_level=8).covering(ring)
    lvl = max(int(h.level(np.uint64(c))) for c in cu.ids)
    rasterized = cellunion_boundary(cu, lvl)
    inter = polygon_intersection(region, rasterized)
    union = polygon_union(region, rasterized)
    # covering is a superset: region ∩ raster == region (by area)
    assert abs(inter.area() - region.area()) < 1e-9
    iou = inter.area() / union.area()
    assert iou > 0.6, iou  # level-8 cells around a 5-degree ring


def test_corner_touching_cells_make_two_rings():
    """Two cells of the set meeting ONLY at a corner must vectorize into TWO
    separate rings, each with the correct area — not one self-touching
    figure-8 (ADVICE r2: stitching must take the most-sharply-left
    continuation at multi-edge corner nodes, not insertion order)."""
    lvl = 6
    tested = 0
    # several faces/orientations: Hilbert curve orientation varies edge
    # insertion order, and the (-40,150) and (0,-179) pairs are ones where
    # the wrong (most-sharply-right) rule measurably merges the rings
    for lat, lng in ((37.0, -100.0), (5.0, 30.0), (-40.0, 150.0), (60.0, 10.0), (0.0, -179.0)):
        base = hilbert.cellid_from_latlng(lat, lng)
        c0 = int(np.uint64(h.parent(np.uint64(base), lvl)))
        # a vertex neighbor that is NOT an edge neighbor = diagonal contact
        edge_n = {int(np.uint64(x)) for x in h.edge_neighbors(np.uint64(c0))}
        v0 = {tuple(np.round(p, 12)) for p in Cell(c0).vertices()}
        picked = None
        for v in h.vertex_neighbors(np.uint64(c0), lvl):
            d = int(np.uint64(v))
            if d in edge_n or d == c0:
                continue
            vd = {tuple(np.round(p, 12)) for p in Cell(d).vertices()}
            if len(v0 & vd) == 1:  # true corner contact: one shared vertex
                picked = d
                break
        if picked is None:
            continue
        cu = CellUnion([c0, picked])
        poly = cellunion_boundary(cu, lvl)
        assert poly.num_loops() == 2, (lat, lng)
        want_area = Cell(c0).exact_area() + Cell(picked).exact_area()
        assert abs(poly.area() - want_area) < 1e-12
        # each ring is a valid 4-vertex cell boundary
        for lp in poly.loops:
            assert len(lp.vertices) == 4
            assert lp.find_validation_error() is None
        tested += 1
    assert tested >= 4


def test_face_wrap_table_matches_kernel():
    """specs.FACE_WRAP (the oracle's cube-edge topology) must equal the
    kernel's geometric from_face_ij_wrap for EVERY (face, dir, t) at two
    levels — the exhaustive proof that the SQL CASE table and the tested
    kernel agree."""
    from rust_s2_spark.engine import specs

    def probe(f, d, t, lvl):
        n = 1 << lvl
        size = 1 << (30 - lvl)
        if d in (0, 2):
            ti, tj = t, (0 if d == 0 else n - 1)
            ii, jj = ti * size, tj * size + (-size if d == 0 else size)
        else:
            ti, tj = (n - 1 if d == 1 else 0), t
            ii, jj = ti * size + (size if d == 1 else -size), tj * size
        leaf = h.from_face_ij_wrap(np.int64(f), np.int64(ii), np.int64(jj))
        nb = h.parent(np.uint64(leaf), lvl)
        f2, i2, j2, _ = h.cellid_to_face_ij_orientation(np.uint64(nb))
        return int(f2), int(i2) >> (30 - lvl), int(j2) >> (30 - lvl)

    for lvl in (4, 6):
        n = 1 << lvl
        sym = {"0": lambda t: 0, "N1": lambda t: n - 1,
               "T": lambda t: t, "N1-T": lambda t: n - 1 - t}
        for (f, d), (f2, fi, fj) in specs.FACE_WRAP.items():
            for t in range(n):
                got = probe(f, d, t, lvl)
                assert got == (f2, sym[fi](t), sym[fj](t)), (f, d, t, lvl, got)


def test_driver_mask_invariants_sf0001():
    """The s2_vectorize driver masks (occupied@L4 + hotspot@L5 over the
    sf0.001 events), replayed in pure numpy: stitched vertex count equals
    the boundary-edge count from kernel edge-neighbor membership, the
    polygon area equals the mask's cell-area sum, and membership round-trips
    on probe points."""
    import duckdb

    from rust_s2_spark.engine import specs
    from rust_s2_spark.kernel.vectorize import tile_quad_areas

    ids = duckdb.sql(
        "SELECT event_id FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchnumpy()["event_id"].astype(np.int64)
    lat, lng = specs.latlng_np(ids)
    leaf = hilbert.cellid_from_latlng(lat, lng)
    rng = np.random.default_rng(11)
    for variant, lvl, hot in specs.VECTORIZE_VARIANTS:
        til = h.parent(leaf, lvl)
        u, c = np.unique(til, return_counts=True)
        mask = u[c >= 2.0 * (c.sum() / len(c))] if hot else u
        in_set = {int(x) for x in mask}
        nbrs = np.asarray(h.edge_neighbors(mask), dtype=np.uint64)
        n_bd = int(sum(int(x) not in in_set for x in nbrs.ravel()))
        poly = cellunion_boundary(CellUnion([int(x) for x in mask]), lvl)
        assert sum(len(lp.vertices) for lp in poly.loops) == n_bd
        cell_sum = float(np.sum(tile_quad_areas(mask, lvl)))
        assert abs(poly.area() - cell_sum) < 1e-10 * max(1.0, cell_sum)
        # membership roundtrip on random probe points
        la = rng.uniform(-80, 80, 300)
        ln = rng.uniform(-179, 179, 300)
        probes = h.parent(hilbert.cellid_from_latlng(la, ln), lvl)
        for k in range(300):
            p = _latlng_point(math.radians(la[k]), math.radians(ln[k]))
            assert poly.contains_point(p) == (int(probes[k]) in in_set)


def test_batched_corners_bit_identical_to_cell_vertex():
    """The batched corner computation inside cellunion_boundary must stay
    bit-identical to the scalar Cell.vertex path (corner keys feed the
    stitch's vertex matching)."""
    from rust_s2_spark.kernel import stuv
    from rust_s2_spark.kernel.region import Cell

    rng = np.random.default_rng(7)
    for lvl in (3, 7):
        la = rng.uniform(-85, 85, 80)
        ln = rng.uniform(-180, 180, 80)
        ids_arr = h.parent(hilbert.cellid_from_latlng(la, ln), lvl)
        f, i, j, _ = hilbert.cellid_to_face_ij_orientation(ids_arr)
        cs = np.int64(h.size_ij(lvl))
        x_lo = i.astype(np.int64) & -cs
        y_lo = j.astype(np.int64) & -cs
        u_lo = stuv.st_to_uv(stuv.ij_to_stmin(x_lo))
        u_hi = stuv.st_to_uv(stuv.ij_to_stmin(x_lo + cs))
        v_lo = stuv.st_to_uv(stuv.ij_to_stmin(y_lo))
        v_hi = stuv.st_to_uv(stuv.ij_to_stmin(y_lo + cs))
        fi = f.astype(np.int64)
        for k, (cu_, cv_) in enumerate(
            ((u_lo, v_lo), (u_hi, v_lo), (u_hi, v_hi), (u_lo, v_hi))
        ):
            x, y, z = stuv.face_uv_to_xyz(fi, cu_, cv_)
            nn = np.sqrt(x * x + y * y + z * z)
            vec = np.stack([x / nn, y / nn, z / nn], axis=-1)
            for t in range(len(ids_arr)):
                assert np.array_equal(Cell(int(ids_arr[t])).vertex(k), vec[t])


def test_dense_pinched_masks_valid():
    """Dense random masks (~56% fill) are full of PINCHES — cells meeting
    diagonally around enclosed pockets.  Any local pairing rule yields
    boundary walks that revisit the pinch vertex, and a Loop must not
    repeat vertices: the stitcher splits such walks into rings that merely
    SHARE the pinch.  Before this worked, these masks collapsed to an
    EMPTY polygon (the self-touching loops cycled the nesting forest).
    Gate: vertex-count identity, exact area identity, membership
    round-trip, and no duplicate vertices in any loop."""
    from rust_s2_spark.kernel.vectorize import tile_quad_areas

    for seed, n, lvl in ((38, 1500, 4), (900, 1500, 4), (68, 300, 3), (176, 57, 2)):
        rng = np.random.default_rng(seed)
        la = rng.uniform(-89, 89, n)
        ln = rng.uniform(-180, 180, n)
        mask = np.unique(h.parent(hilbert.cellid_from_latlng(la, ln), lvl))
        in_set = {int(x) for x in mask}
        nbrs = np.asarray(h.edge_neighbors(mask), dtype=np.uint64)
        n_bd = int(sum(int(x) not in in_set for x in nbrs.ravel()))
        poly = cellunion_boundary(CellUnion([int(x) for x in mask]), lvl)
        assert sum(len(lp.vertices) for lp in poly.loops) == n_bd
        for lp in poly.loops:
            keys = [tuple(np.round(v, 14)) for v in lp.vertices]
            assert len(set(keys)) == len(keys)  # no self-touching loops
        cell_sum = float(np.sum(tile_quad_areas(mask, lvl)))
        assert abs(poly.area() - cell_sum) < 1e-10 * max(1.0, cell_sum)
        rng2 = np.random.default_rng(seed + 1)
        la2 = rng2.uniform(-85, 85, 150)
        ln2 = rng2.uniform(-179, 179, 150)
        probes = h.parent(hilbert.cellid_from_latlng(la2, ln2), lvl)
        for t in range(150):
            p = _latlng_point(math.radians(la2[t]), math.radians(ln2[t]))
            assert poly.contains_point(p) == (int(probes[t]) in in_set)


def test_vectorize_full_grid_zero_boundary_vertices(tmp_path, spark):
    """When the events saturate EVERY level-4 tile, the occ mask covers the
    sphere: zero boundary edges, so n_vertices must be 0 (the FULL
    polygon's sentinel vertex is an encoding artifact, not geometry) and
    the area is the full 4*pi.  Found by the sf1 gate: 1M events saturate
    the grid and the Spark side reported the sentinel vertex as 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_s2_spark.engine import specs
    from rust_s2_spark.engine.queries import QUERIES

    # minimal saturating fixture: the first event_id landing in each of the
    # 6*4^4 level-4 tiles under the spec's derived-latlng LCG
    ids = np.arange(20_000, dtype=np.int64)
    la, ln = specs.latlng_np(ids)
    tiles = h.parent(hilbert.cellid_from_latlng(la, ln), 4)
    _, first = np.unique(tiles, return_index=True)
    assert len(first) == 6 * 4**4, "fixture must saturate the level-4 grid"
    pq.write_table(
        pa.table({"event_id": pa.array(np.sort(ids[first]))}),
        str(tmp_path / "events.parquet"),
    )
    rows = {r["variant"]: r for r in QUERIES["s2_vectorize"](spark, str(tmp_path)).collect()}
    occ = rows["occ"]
    assert occ["n_cells"] == 6 * 4**4
    assert occ["n_vertices"] == 0
    assert occ["area_r"] == round(4.0 * math.pi, 7)
    # every fine tile holds exactly one event -> no tile reaches 2x mean
    assert rows["hot"]["n_cells"] == 0 and rows["hot"]["n_vertices"] == 0


def test_vectorize_empty_events_guard(tmp_path, spark):
    """An empty events table degrades to two zero rows (n_cells=0,
    n_vertices=0, area_r=0.0) instead of ZeroDivisionError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_s2_spark.engine.queries import QUERIES

    pq.write_table(
        pa.table({"event_id": pa.array([], type=pa.int64())}),
        str(tmp_path / "events.parquet"),
    )
    rows = QUERIES["s2_vectorize"](spark, str(tmp_path)).collect()
    assert [
        (r["variant"], r["n_cells"], r["n_vertices"], r["area_r"]) for r in rows
    ] == [("occ", 0, 0, 0.0), ("hot", 0, 0, 0.0)]


def test_winding_fan_area_not_aliased_to_zero():
    """A large non-convex boundary ring can integrate its triangle fan one
    4*pi sheet HIGH (each fan triangle's signed area is computed on its
    principal sheet).  loop.rs:1848-1852 wraps only negative sums, so its
    clamp + orientation branch aliased such loops to area 0; Loop.area now
    normalizes mod 4*pi.  Fuzz seed 1100441: a 45/96-cell level-2 mask whose
    60-vertex ring has true area 4.8766 (certified by Gauss-Bonnet
    2*pi - turning_angle, exact for simple loops) but integrated to
    area + 4*pi = 17.443."""
    from rust_s2_spark.kernel.vectorize import tile_quad_areas

    rng = np.random.default_rng(1100441)
    lvl = int(rng.integers(2, 6))
    n = int(rng.integers(30, 1200))
    la = rng.uniform(-89, 89, n)
    ln = rng.uniform(-180, 180, n)
    mask = np.unique(h.parent(hilbert.cellid_from_latlng(la, ln), lvl))
    assert (lvl, len(mask)) == (2, 45)  # pins the regression geometry
    poly = cellunion_boundary(CellUnion([int(x) for x in mask]), lvl)
    big = max(poly.loops, key=lambda lp: len(lp.vertices))
    assert len(big.vertices) == 60
    # Gauss-Bonnet certificate, independent of the fan integral
    gb = 2.0 * math.pi - big.turning_angle()
    assert abs(big.area() - gb) < 1e-9
    assert big.area() > 4.0  # the old code returned exactly 0.0
    cell_sum = float(np.sum(tile_quad_areas(mask, lvl)))
    assert abs(poly.area() - cell_sum) < 1e-10 * max(1.0, cell_sum)
