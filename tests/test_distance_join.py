"""Within-distance pairwise self-join (engine/join.py distance_self_join).

Exactness is enforced three ways: the vectorized Moore-neighborhood kernel
vs the scalar cellid.rs:389-439 port, the full operator vs a numpy
brute-force on adversarial fixtures (tight clusters at cube-face corners —
the cases the Moore-adjacency completeness argument must survive), and the
driver oracle (brute-force SQL) at sf0.001/0.01/0.1.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel.constants import MIN_WIDTH


def _rand_cells(rng, n, lvl):
    f = rng.randint(0, 6, n)
    pos = rng.randint(0, 4 ** min(lvl, 15), n)
    shift = max(0, 2 * (lvl - 15))
    return np.array(
        [int(h.from_face_pos_level(int(ff), int(pp) << shift, lvl)) for ff, pp in zip(f, pos)],
        dtype=np.uint64,
    )


class TestMooreKernel:
    def test_matches_scalar_incl_face_corners(self):
        rng = np.random.RandomState(3)
        ids = []
        for lvl in (1, 3, 6, 11, 19, 30):
            ids.extend(int(c) for c in _rand_cells(rng, 25, lvl))
            for f in range(6):  # the 4 corner cells of every face
                side = 1 << min(lvl, 15)
                shift = max(0, 2 * (lvl - 15))
                for pos in (0, side - 1, side * (side - 1), side * side - 1):
                    ids.append(int(h.from_face_pos_level(f, pos << shift, lvl)))
        arr = np.array(ids, dtype=np.uint64)
        vec = h.all_neighbors_same_level(arr)
        for k, cid in enumerate(ids):
            lvl = int(h.level(np.uint64(cid)))
            expect = set(int(x) for x in h.all_neighbors(np.uint64(cid), lvl))
            got = set(int(x) for x in np.unique(vec[k]))
            assert got == expect, hex(cid)

    def test_shape_and_level(self):
        arr = _rand_cells(np.random.RandomState(5), 40, 6)
        vec = h.all_neighbors_same_level(arr)
        assert vec.shape == (40, 8)
        assert (h.level(vec.reshape(-1).astype(np.uint64)) == 6).all()


def _brute_pairs(ids, lat, lng, radius_rad):
    la, ln = np.radians(lat), np.radians(lng)
    xyz = np.stack([np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)], 1)
    chord2 = (2.0 * math.sin(radius_rad / 2.0)) ** 2
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if d2[i, j] <= chord2:
                a, b = int(ids[i]), int(ids[j])
                out.add((min(a, b), max(a, b)))
    return out


def _run_join(spark, ids, lat, lng, radius, lvl=None):
    from rust_s2_spark.engine.join import distance_self_join
    from rust_s2_spark.engine.tiling import with_leaf_cellid

    rows = [(int(i), float(a), float(o)) for i, a, o in zip(ids, lat, lng)]
    df = with_leaf_cellid(
        spark.createDataFrame(rows, "event_id long, lat double, lng double")
    )
    got = distance_self_join(df, radius, lvl=lvl).collect()
    pairs = set((r.event_a, r.event_b) for r in got)
    assert len(pairs) == len(got), "duplicate pair emitted"
    assert all(a < b for a, b in pairs)
    return pairs


class TestDistanceSelfJoin:
    def test_clusters_at_face_corners(self, spark):
        """Tight clusters straddling cube-face corners and edges: the
        adversarial case for Moore-adjacency completeness (wrapped and
        duplicate neighbors)."""
        rng = np.random.RandomState(11)
        # face corners in latlng: corners of the cube are at
        # (+-1,+-1,+-1)/sqrt(3) -> lat ~ +-35.26, lng multiples of 45
        anchors = [(35.264389682754654, 45.0), (-35.264389682754654, -135.0),
                   (0.0, 0.0), (0.0, 90.0), (45.0, 0.0), (-90.0, 0.0), (85.0, 17.0)]
        ids, lat, lng = [], [], []
        k = 1
        for alat, alng in anchors:
            for _ in range(12):
                ids.append(k); k += 1
                lat.append(np.clip(alat + rng.uniform(-1.2, 1.2), -89.9, 89.9))
                lng.append(alng + rng.uniform(-1.2, 1.2))
        radius = 0.014
        expect = _brute_pairs(ids, np.array(lat), np.array(lng), radius)
        got = _run_join(spark, ids, lat, lng, radius)
        assert got == expect
        assert len(expect) > 50  # the fixture is genuinely dense

    def test_random_sphere_matches_brute_force(self, spark):
        rng = np.random.RandomState(23)
        n = 300
        z = rng.uniform(-1, 1, n)
        lat = np.degrees(np.arcsin(z))
        lng = rng.uniform(-180, 180, n)
        # big radius at a coarse level (level 2): lots of cross-cell and
        # cross-face pairs
        radius = 0.2
        lvl = MIN_WIDTH.max_level(radius)
        if MIN_WIDTH.value(lvl) <= radius:
            lvl -= 1
        ids = np.arange(1, n + 1)
        expect = _brute_pairs(ids, lat, lng, radius)
        got = _run_join(spark, ids, lat, lng, radius, lvl=lvl)
        assert got == expect
        assert len(expect) > 100

    def test_level_guard(self, spark):
        from rust_s2_spark.engine.join import distance_self_join
        from rust_s2_spark.engine.tiling import with_leaf_cellid

        df = with_leaf_cellid(
            spark.createDataFrame([(1, 0.0, 0.0)], "event_id long, lat double, lng double")
        )
        with pytest.raises(ValueError, match="min_width"):
            distance_self_join(df, 0.05, lvl=8)

    def test_auto_level_strictly_safe(self):
        from rust_s2_spark.engine import specs

        lvl = MIN_WIDTH.max_level(specs.DISTANCE_JOIN_RADIUS)
        if MIN_WIDTH.value(lvl) <= specs.DISTANCE_JOIN_RADIUS:
            lvl -= 1
        assert MIN_WIDTH.value(lvl) > specs.DISTANCE_JOIN_RADIUS
        assert lvl == 6  # pins the production level for the spec radius

    def test_empty_input(self, spark):
        from rust_s2_spark.engine.join import distance_self_join
        from rust_s2_spark.engine.tiling import with_leaf_cellid

        df = with_leaf_cellid(
            spark.createDataFrame([], "event_id long, lat double, lng double")
        )
        out = distance_self_join(df, 0.014)
        assert out.count() == 0
        assert out.columns == ["event_a", "event_b", "chord2_r"]
