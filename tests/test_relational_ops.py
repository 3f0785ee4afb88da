"""Semantics pins for the round-3 relational/pipeline additions:
as-of join tie rules, BPE-ish token counting, deterministic sampling."""

import datetime

import pytest

from rust_s2_spark.engine.queries import BPE_PAT, q_asof_join, q_sample_hash


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    # match testdata layout: one parquet dir per table under the sf dir
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_tie_and_missing_semantics(spark, tmp_path):
    """A click at the exact purchase timestamp counts as 'before'; a
    purchase with no prior click yields NULL click columns; later clicks
    never leak backwards."""
    rows = [
        # user 1: click 10:00, purchase 10:05 -> attributed, gap 300s
        (1, _ts("2024-01-01T10:00:00"), 1, "click", 0.0, ""),
        (2, _ts("2024-01-01T10:05:00"), 1, "purchase", 1.0, ""),
        # user 2: purchase first (no prior click), then click, then purchase
        (3, _ts("2024-01-01T09:00:00"), 2, "purchase", 1.0, ""),
        (4, _ts("2024-01-01T09:30:00"), 2, "click", 0.0, ""),
        (5, _ts("2024-01-01T09:45:00"), 2, "purchase", 1.0, ""),
        # user 3: click at the EXACT purchase ts -> counts (tie rule)
        (6, _ts("2024-01-01T12:00:00"), 3, "click", 0.0, ""),
        (7, _ts("2024-01-01T12:00:00"), 3, "purchase", 1.0, ""),
        # noise types are ignored
        (8, _ts("2024-01-01T11:59:00"), 3, "view", 0.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_id"]: r for r in q_asof_join(spark, sf).collect()}
    assert set(out) == {2, 3, 5, 7}
    assert out[2]["click_id"] == 1 and out[2]["gap_us"] == 300_000_000
    assert out[3]["click_id"] is None and out[3]["gap_us"] is None
    assert out[5]["click_id"] == 4 and out[5]["gap_us"] == 900_000_000
    assert out[7]["click_id"] == 6 and out[7]["gap_us"] == 0


def test_asof_single_shuffle_plan(spark, tmp_path):
    """Both window passes share one (user_id) partitioning: exactly one
    exchange above the scan — the canonical as-of plan, no range join."""
    rows = [(1, _ts("2024-01-01T10:00:00"), 1, "click", 0.0, "")]
    sf = _write_events(spark, tmp_path, rows)
    plan = q_asof_join(spark, sf)._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning exchange on user_id for the windows; the only
    # other exchange allowed is the spread-on-read repartition of the scan
    n_ex = plan.count("Exchange hashpartitioning")
    assert 1 <= n_ex <= 2, plan
    assert "user_id" in plan.split("Exchange hashpartitioning")[1]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bpe_pattern_pieces():
    """The regex pretokenizer splits the way a BPE pretokenizer does."""
    import re

    pieces = re.findall(BPE_PAT, "It's 42 well-known examples, isn't it?")
    joined = "".join(pieces)
    assert joined.replace(" ", "") == "It's42well-knownexamples,isn'tit?"
    assert "'s" in pieces and "'t" in pieces
    assert " 42" in pieces and "-" in pieces


def test_sample_hash_deterministic(spark):
    """Same rows on every run and under different parallelism — the
    reproducibility property rand()-based sampling lacks."""
    sf = "/root/testdata/sf0.001"
    a = sorted(r["doc_id"] for r in q_sample_hash(spark, sf).collect())
    b = sorted(r["doc_id"] for r in q_sample_hash(spark, sf).repartition(7).collect())
    assert a == b
    assert 0 < len(a) < 500  # a real subset at ~30%


def test_covering_set_ops_flags_equal_set_op_form(spark):
    """s2_covering_set_ops ships the one-shuffle membership-flags plan; this
    pins it row-for-row to the literal DataFrame set-op algebra
    (intersect / exceptAll over the distinct per-side cell sets) it
    replaces, on the real sf0.001 events."""
    from pyspark.sql import functions as F

    from rust_s2_spark.engine.queries import QUERIES, _derived_cell12_sql, _read

    sf = "/root/testdata/sf0.001"
    got = {(r.cell_id, r.tag) for r in QUERIES["s2_covering_set_ops"](spark, sf).collect()}

    cells = _read(spark, sf, "events").select("event_id").withColumn(
        "cell12", F.expr(_derived_cell12_sql())
    )
    a = cells.where(F.col("event_id") % 2 == 0).select("cell12").distinct()
    b = cells.where(F.col("event_id") % 3 == 0).select("cell12").distinct()
    both = a.intersect(b).withColumn("tag", F.lit("both"))
    a_only = a.exceptAll(b).withColumn("tag", F.lit("a_only"))
    b_only = b.exceptAll(a).withColumn("tag", F.lit("b_only"))
    ref = both.unionByName(a_only).unionByName(b_only)
    expect = {(r.cell12, r.tag) for r in ref.collect()}
    assert got == expect
    assert len(expect) > 100
