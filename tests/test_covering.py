"""CellUnion + RegionCoverer oracles ported from the reference.

Vectors: cellunion.rs:264-293 (normalize golden), 356-468 (NYC/SFO membership),
677-736 (denormalize); region.rs:557-748 (coverer properties + tight-covering
checker).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel.covering import CellUnion, RegionCoverer
from rust_s2_spark.kernel.region import Cap, Cell, Rect
from rust_s2_spark.kernel.constants import MAX_LEVEL


def U(x):
    return np.uint64(x)


def test_normalize_golden():
    # cellunion.rs:264-284
    cu = CellUnion(
        [
            0x80855C0000000000,
            0x80855D0000000000,
            0x8085634000000000,
            0x808563C000000000,
            0x80855DC000000000,
            0x808562C000000000,
            0x8085624000000000,
            0x80855D0000000000,
        ]
    )
    cu.normalize()
    assert cu.ids == [0x80855C0000000000, 0x8085630000000000]


def test_membership_nyc():
    # cellunion.rs:357-384 — single NYC cell
    base = U(0x89C25C0000000000)
    cu = CellUnion([int(base)])
    cu.normalize()
    contained = [
        int(h.child_begin_at_level(base, int(h.level(base)) + 1)),
        int(h.child_begin_at_level(base, 28)),
    ]
    overlaps = [
        int(h.immediate_parent(base)),
        int(h.from_face(int(base) >> 61)),
    ]
    disjoint = [
        int(h.next_cell(base)),
        int(h.child_begin_at_level(h.next_cell(base), 28)),
        0x89C2700000000000,
        0x89E9000000000000,
        0x89C1000000000000,
    ]
    for cid in contained:
        assert cu.contains_cellid(cid), hex(cid)
        assert cu.intersects_cellid(cid), hex(cid)
    for cid in overlaps:
        assert not cu.contains_cellid(cid), hex(cid)
        assert cu.intersects_cellid(cid), hex(cid)
    for cid in disjoint:
        assert not cu.contains_cellid(cid), hex(cid)
        assert not cu.intersects_cellid(cid), hex(cid)


def test_membership_nyc_sfo():
    # cellunion.rs:385-430
    cu = CellUnion(
        [
            0x89C25B0000000000,
            0x89C2590000000000,
            0x89C2F70000000000,
            0x89C2F50000000000,
            0x8085870000000000,
            0x8085810000000000,
            0x808F7D0000000000,
            0x808F7F0000000000,
        ]
    )
    cu.normalize()
    contained = [
        0x808F7EF300000000,
        0x808F7E5CF0000000,
        0x808587F000000000,
        0x89C25AC000000000,
        0x89C259A400000000,
        0x89C258FA10000000,
        0x89C258F174007000,
    ]
    overlaps = [0x808C000000000000, 0x89C4000000000000]
    disjoint = [
        0x89C15A4FCB1BB000,
        0x89C15A4E4AA95000,
        0x8094000000000000,
        0x8096F10000000000,
        0x87C0000000000000,
    ]
    for cid in contained:
        assert cu.contains_cellid(cid) and cu.intersects_cellid(cid), hex(cid)
    for cid in overlaps:
        assert not cu.contains_cellid(cid) and cu.intersects_cellid(cid), hex(cid)
    for cid in disjoint:
        assert not cu.contains_cellid(cid) and not cu.intersects_cellid(cid), hex(cid)
    # vectorized membership agrees with scalar on leaf probes
    leaves = np.array(
        [h.child_begin_at_level(U(c), MAX_LEVEL) for c in contained + disjoint],
        dtype=np.uint64,
    )
    got = cu.contains_points(leaves)
    want = np.array([cu.contains_cellid(int(v)) for v in leaves])
    assert np.array_equal(got, want)
    assert got[: len(contained)].all() and not got[len(contained) :].any()


def cfbl(face, level):
    # cellunion.rs:673-675
    return int(h.child_begin_at_level(h.from_face(face), level))


def children(cid):
    return [int(c) for c in h.children(U(cid))]


def test_denormalize_cases():
    # cellunion.rs:677-736
    cu = CellUnion([cfbl(2, 11), cfbl(2, 11), cfbl(3, 14), cfbl(0, 10)])
    cu.denormalize(10, 1)
    assert cu.ids == [cfbl(2, 11), cfbl(2, 11), cfbl(3, 14), cfbl(0, 10)]

    cu = CellUnion([cfbl(2, 12), cfbl(2, 12), cfbl(3, 14), cfbl(0, 10)])
    cu.denormalize(10, 2)
    assert cu.ids == [cfbl(2, 12), cfbl(2, 12), cfbl(3, 14), cfbl(0, 10)]

    cu = CellUnion([cfbl(2, 12), cfbl(5, 11)])
    cu.denormalize(10, 3)
    want = children(cfbl(2, 12))
    for child in children(cfbl(5, 11)):
        want.extend(children(child))
    assert cu.ids == want

    cu = CellUnion([cfbl(2, 9)])
    cu.denormalize(10, 3)
    assert cu.ids == children(cfbl(2, 9))


def test_from_range():
    # property: from_range tiles exactly [begin, end)
    begin = int(h.child_begin_at_level(h.from_face(1), MAX_LEVEL)) + 1234567 * 2
    end = begin + 2 * 10_000_000
    cu = CellUnion.from_range(begin, end)
    # coverage is exact and disjoint
    total = cu.leaf_cells_covered()
    assert total == (end - begin) // 2 + (0 if (end - begin) % 2 == 0 else 1) or total == (
        (end - begin) >> 1
    )
    rmins = [int(h.range_min(U(c))) for c in cu.ids]
    rmaxs = [int(h.range_max(U(c))) for c in cu.ids]
    assert rmins[0] == begin
    assert rmaxs[-1] == end - 2  # end is exclusive leaf
    for i in range(1, len(cu.ids)):
        assert rmins[i] == rmaxs[i - 1] + 2


# ---------------------------------------------------------------------------
# RegionCoverer properties (region.rs:557-748)
# ---------------------------------------------------------------------------


def test_coverer_cell_identity():
    # region.rs:557-574: covering a Cell with max_cells=1 is the cell itself.
    rng = np.random.default_rng(7)
    rc = RegionCoverer(min_level=0, max_level=30, level_mod=1, max_cells=1)
    for _ in range(60):
        face = int(rng.integers(0, 6))
        lvl = int(rng.integers(0, 31))
        pos = int(rng.integers(0, 1 << 61)) & ((1 << 61) - 1)
        cid = int(h.from_face_pos_level(face, U(pos), lvl))
        covering = rc.covering(Cell(cid))
        assert covering.ids == [cid]


def check_covering(rc: RegionCoverer, region, covering: CellUnion, interior: bool):
    # region.rs:578-616
    min_level_cells = {}
    for ci in covering.ids:
        level = int(h.level(U(ci)))
        assert rc.min_level <= level <= rc.max_level
        assert (level - rc.min_level) % rc.level_mod == 0
        par = int(h.parent(U(ci), rc.min_level))
        min_level_cells[par] = min_level_cells.get(par, 0) + 1
    if len(covering.ids) > rc.max_cells:
        for count in min_level_cells.values():
            assert count == 1
    if interior:
        for ci in covering.ids:
            assert region.contains_cell(Cell(ci))
    else:
        tmp = CellUnion(list(covering.ids))
        tmp.normalize()
        check_covering_tight(region, tmp, True, None)


def check_covering_tight(region, cover: CellUnion, check_tight: bool, cid):
    # region.rs:620-649
    if cid is None:
        for f in range(6):
            check_covering_tight(region, cover, check_tight, int(h.from_face(f)))
        return
    cell = Cell(cid)
    if not region.intersects_cell(cell):
        if check_tight:
            assert not cover.intersects_cellid(cid)
    elif not cover.contains_cellid(cid):
        assert not region.contains_cell(cell)
        assert not h.is_leaf(U(cid))
        for child in children(cid):
            check_covering_tight(region, cover, check_tight, child)


def _random_cap(rng, min_area, max_area):
    # random.rs:26-32 semantics: log-area-uniform caps
    area = min_area * (max_area / min_area) ** float(rng.uniform(0, 1))
    u = rng.uniform(-1, 1)
    lng = rng.uniform(-180, 180)
    lat = math.degrees(math.asin(u))
    radius_rad = math.acos(max(-1.0, 1.0 - area / (2 * math.pi)))
    return Cap.from_latlng_radius(lat, lng, math.degrees(radius_rad))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_coverer_random_caps(seed):
    # region.rs:652-678: cap area bounded so ~O(max_cells) cells intersect at
    # min_level — otherwise the exterior covering is exponentially large.
    from rust_s2_spark.kernel.constants import AVG_AREA

    rng = np.random.default_rng(seed)
    for _ in range(20):
        min_level = int(rng.integers(0, 31))
        max_level = int(rng.integers(0, 31))
        if min_level > max_level:
            min_level, max_level = max_level, min_level
        level_mod = int(rng.integers(1, 4))
        max_cells = int(rng.integers(1, 10))
        rc = RegionCoverer(
            min_level=min_level, max_level=max_level, level_mod=level_mod, max_cells=max_cells
        )
        max_area = min(4 * math.pi, (3 * max_cells + 1) * AVG_AREA.value(min_level))
        cap = _random_cap(rng, 0.1 * AVG_AREA.value(max_level), max_area)
        covering = rc.covering(cap)
        interior = rc.interior_covering(cap)
        check_covering(rc, cap, covering, False)
        check_covering(rc, cap, interior, True)
        # determinism (region.rs:686-688)
        again = rc.covering(cap)
        assert again.ids == covering.ids


def test_coverer_rect():
    rc = RegionCoverer(min_level=0, max_level=30, level_mod=1, max_cells=8)
    rect = Rect.from_degrees(37.0, -123.0, 38.5, -121.0)
    covering = rc.covering(rect)
    assert 1 <= len(covering.ids) <= 8
    check_covering(rc, rect, covering, False)
    # dateline-crossing rect
    rect2 = Rect.from_degrees(-10.0, 170.0, 10.0, -170.0)
    cov2 = rc.covering(rect2)
    check_covering(rc, rect2, cov2, False)


def test_cap_covering_contains_points():
    # End-to-end: points sampled inside the cap are contained by the covering.
    rng = np.random.default_rng(11)
    cap = Cap.from_latlng_radius(37.7749, -122.4194, 2.0)
    rc = RegionCoverer(max_cells=8)
    cov = rc.covering(cap)
    from rust_s2_spark.kernel import hilbert

    lat = 37.7749 + rng.uniform(-1.2, 1.2, 500)
    lng = -122.4194 + rng.uniform(-1.2, 1.2, 500)
    cids = hilbert.cellid_from_latlng(lat, lng)
    from rust_s2_spark.kernel.stuv import latlng_to_xyz

    x, y, z = latlng_to_xyz(lat, lng)
    inside = np.array(
        [cap.contains_point(np.array([x[i], y[i], z[i]])) for i in range(len(lat))]
    )
    member = cov.contains_points(cids)
    # covering must contain every inside point (may contain extra outside ones)
    assert np.all(member[inside])


def test_face_index_cell_relations_equivalent():
    """The per-face 2D edge index (used for loops >= 64 vertices) must agree
    with the exact EdgeCrosser sweep on every candidate cell, and produce
    the identical covering."""
    import math

    import numpy as np

    from rust_s2_spark.kernel import hierarchy as h
    from rust_s2_spark.kernel.pip import regular_loop
    from rust_s2_spark.kernel.region import Cell, _latlng_point

    center = _latlng_point(math.radians(40), math.radians(-100))
    a = regular_loop(center, math.radians(5), 128)
    b = regular_loop(center, math.radians(5), 128)
    a._FACE_INDEX_THRESHOLD = 1       # force indexed
    b._FACE_INDEX_THRESHOLD = 10**9   # force crosser sweep
    cov = RegionCoverer(max_cells=32).covering(b)
    cells = []
    for cid in cov.ids:
        cells.append(Cell(cid))
        for k in h.children(np.uint64(cid)):
            cells.append(Cell(int(k)))
    for c in cells:
        assert a.intersects_cell(c) == b.intersects_cell(c)
        assert a.contains_cell(c) == b.contains_cell(c)
    cov_a = RegionCoverer(max_cells=32).covering(
        regular_loop(center, math.radians(5), 128)
    )
    assert cov_a.ids == cov.ids  # default path (indexed at 128) == crosser


def test_face_index_large_loop_covering():
    """Covering generation on a coastline-sized loop must be fast (the
    indexed path) and valid."""
    import math
    import time

    from rust_s2_spark.kernel.hilbert import cellid_from_latlng
    from rust_s2_spark.kernel.pip import regular_loop
    from rust_s2_spark.kernel.region import _latlng_point

    center = _latlng_point(math.radians(40), math.radians(-100))
    big = regular_loop(center, math.radians(8), 2048)
    t0 = time.time()
    cu = RegionCoverer(max_cells=32).covering(big)
    elapsed = time.time() - t0
    assert elapsed < 20  # crosser-only path takes ~35s+ at this size
    assert 1 <= len(cu.ids) <= 32
    assert cu.contains_cellid(int(cellid_from_latlng(40.0, -100.0)))
