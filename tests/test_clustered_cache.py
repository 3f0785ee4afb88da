"""Clustered-table memo lifecycle: a rewritten dataset must be re-clustered
after clear_geo_cache(), and two datasets sharing a basename must not alias
to one clustered copy (the on-disk path is keyed by the FULL dataset dir)."""

from __future__ import annotations

import numpy as np

from rust_s2_spark.engine import queries as Q


def _write_events(spark, path: str, ids: range) -> None:
    spark.createDataFrame(
        [(int(i),) for i in ids], "event_id long"
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _rows(spark, sf_dir: str):
    return sorted(map(tuple, Q.q_cap_join_clustered(spark, sf_dir).collect()))


def test_rewritten_dataset_recluster_after_clear(spark, tmp_path):
    d = str(tmp_path / "ds" / "sfX")
    _write_events(spark, d, range(0, 3000))
    first = _rows(spark, d)
    assert first == sorted(map(tuple, Q.q_cap_join(spark, d).collect()))
    assert first  # caps over globally spread LCG points: non-empty

    # rewrite the dataset in place; the memoized clustered copy is stale
    _write_events(spark, d, range(50000, 53000))
    Q.clear_geo_cache()
    second = _rows(spark, d)
    assert second == sorted(map(tuple, Q.q_cap_join(spark, d).collect()))
    assert second != first


def test_same_basename_datasets_do_not_alias(spark, tmp_path):
    d1 = str(tmp_path / "a" / "sfY")
    d2 = str(tmp_path / "b" / "sfY")
    _write_events(spark, d1, range(0, 3000))
    _write_events(spark, d2, range(50000, 53000))
    r1 = _rows(spark, d1)
    r2 = _rows(spark, d2)  # before the fix this overwrote d1's clustered copy
    assert r1 != r2
    # d1 must still serve ITS rows (not d2's) from its clustered path
    assert _rows(spark, d1) == r1
    assert r1 == sorted(map(tuple, Q.q_cap_join(spark, d1).collect()))
