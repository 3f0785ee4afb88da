"""Results must not depend on partitioning: the same query collected under
different shuffle-partition counts and input repartitioning yields identical
row sets.  Pins the engine's determinism story (no rand(), no
partition-ordering dependence, order-independent aggregates) — what makes
results reproducible across cluster sizes, retries, and AQE re-plans."""

import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    "asof_join",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash_banded",
    "ann_lsh",
    "dedup_exact",
    "events_cube",
    "s2_vectorize",
    "s2_vectorize_dist",
    "s2_cap_join",
    "s2_trajectory_stats",
    "geo_training_features",
]


def _rows(spark, name, shuffle_parts):
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    try:
        # drop memoized per-session tables so the partitioning actually differs
        clear_geo_cache()
        df = QUERIES[name](spark, SF)
        # repr-keyed sort: cube rows mix None with datetimes, which tuple
        # comparison can't order
        return sorted((repr(tuple(r)) for r in df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        clear_geo_cache()


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_partitions(spark, name):
    assert _rows(spark, name, 3) == _rows(spark, name, 32)


def test_result_invariant_without_aqe(spark):
    """AQE re-planning (coalescing, skew splits) must not change results."""
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    def rows():
        clear_geo_cache()
        df = QUERIES["minhash_lsh"](spark, SF)
        return sorted(repr(tuple(r)) for r in df.collect())

    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = rows()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        on = rows()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
        clear_geo_cache()
    assert off == on
