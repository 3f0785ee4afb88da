"""geo_training_features (the curation capstone): composition consistency
against its component queries, and the plan-shape contract (grid-bounded
focal broadcast, unbounded events touched once)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_training_features_compose_components(spark):
    """Every output column must agree row-for-row with the standalone
    component query that owns it — the capstone is a join, not a fork of
    the logic."""
    from rust_s2_spark.engine import specs
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    rows = {r.doc_id: r for r in QUERIES["geo_training_features"](spark, SF).collect()}
    geo = {r.doc_id: r for r in QUERIES["geo_extract"](spark, SF).collect()}
    quality = {r.doc_id: r for r in QUERIES["doc_quality"](spark, SF).collect()}
    tokens = {r.doc_id: r for r in QUERIES["token_count"](spark, SF).collect()}
    dup = {r.doc_id: r for r in QUERIES["dedup_cluster"](spark, SF).collect()}
    focal = {
        (r.face, r.ti, r.tj): r.focal_n
        for r in QUERIES["s2_focal_density"](spark, SF).collect()
    }

    assert set(rows) == set(quality) == set(dup)
    from rust_s2_spark.kernel import hilbert as h
    import numpy as np

    shift = 30 - specs.FOCAL_LEVEL
    for doc_id, r in rows.items():
        assert r.lat == geo[doc_id].lat and r.lng == geo[doc_id].lng
        assert r.quality_score == quality[doc_id].quality_score
        assert r.keep_quality == quality[doc_id].keep
        assert r.n_bpe_tokens == tokens[doc_id].n_bpe_tokens
        assert r.canonical_id == dup[doc_id].canonical_id
        assert r.is_canonical == dup[doc_id].is_canonical
        assert r.train_keep == (r.keep_quality and r.is_canonical)
        # focal_n: decode the doc's tile to grid coords, look up the
        # standalone focal table (0 when no events occupy the tile)
        face, i, j, _ = h.cellid_to_face_ij_orientation(
            np.array([r.tile], dtype=np.int64).view(np.uint64)
        )
        key = (int(face[0]), int(i[0]) >> shift, int(j[0]) >> shift)
        assert r.focal_n == focal.get(key, 0), doc_id
    # the keep decision must be non-trivial
    kept = sum(1 for r in rows.values() if r.train_keep)
    assert 0 < kept < len(rows)
    clear_geo_cache()


def test_training_features_plan_shape(spark):
    """The focal side joins as a broadcast (grid-bounded) and the plan has
    no cartesian/BNL join; the doc-side joins are equi-joins on doc_id."""
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    plan = (
        QUERIES["geo_training_features"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    clear_geo_cache()
