"""Structured Streaming path: deterministic micro-batch ingest -> tiling ->
windowed counts; streamed docs must equal batch docs for the same indices."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_s2_spark.engine import ingest, streaming

pytestmark = pytest.mark.spark


def test_stream_tile_counts_match_batch(spark):
    streaming.run_stream_to_memory(
        spark, rows_per_batch=500, tile_level=4, query_name="tc_test"
    )
    got = spark.table("tc_test")
    rows = got.groupBy("tile").agg(F.sum("n_docs").alias("n")).collect()
    assert rows, "stream produced no windows"
    n_streamed = sum(r["n"] for r in rows)
    assert n_streamed >= 500  # at least one full batch landed

    # the same doc indices through the batch path give identical tile counts
    batch = ingest.synth_docs(spark, n_streamed, partitions=4)
    from rust_s2_spark.engine import tiling

    g = tiling.with_leaf_cellid(ingest.extract_geo(batch))
    g = g.withColumn("tile", tiling.parent_col("cell_id", 4))
    want = {r["tile"]: r["n"] for r in g.groupBy("tile").count().withColumnRenamed("count", "n").collect()}
    got_map = {r["tile"]: r["n"] for r in rows}
    assert got_map == want


def test_streamed_docs_identical_to_batch(spark):
    sdf = streaming.stream_docs(spark, rows_per_batch=200)
    q = (
        sdf.writeStream.format("memory")
        .queryName("docs_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    streamed = spark.table("docs_test").select("doc_id", "spans").orderBy("doc_id").collect()
    n = len(streamed)
    assert n >= 200
    batch = ingest.synth_docs(spark, n, partitions=2).orderBy("doc_id").collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_stateful_sessionization_matches_batch(spark):
    """applyInPandasWithState sessions across MULTIPLE micro-batches must
    equal the batch window-function reference on the consumed prefix."""
    import time

    from rust_s2_spark.engine.streaming import batch_sessions_reference, stream_sessions

    q = (
        stream_sessions(spark, rows_per_batch=200)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 4:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    consumed = sum(p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0)
    assert consumed >= 800, "needed multiple micro-batches to exercise state"
    got = {tuple(r) for r in spark.table("sess_test").collect()}
    want = {tuple(r) for r in batch_sessions_reference(spark, consumed).collect()}
    assert got, "no closed sessions emitted"
    assert got == want


def test_stream_cap_join_matches_batch(spark):
    """Stream-static spatial join: hits from the streaming covering join +
    chord refine must equal the batch cap_join on the same doc indices."""
    streaming.run_stream_cap_join_to_memory(
        spark, rows_per_batch=400, query_name="sc_test"
    )
    got = spark.table("sc_test").select("region_id", "doc_id").collect()
    got_set = {(r["region_id"], r["doc_id"]) for r in got}

    # how many docs were streamed = max doc index + 1 (doc ids are dense)
    n = spark.table("sc_test").count()  # may be 0 hits; need doc count instead
    # recompute the streamed prefix length from the source semantics: one
    # availableNow drain of rate-micro-batch(400) yields >= 400 docs; use the
    # batch path over the same prefix length inferred from a docs drain
    sdf = streaming.stream_docs(spark, rows_per_batch=400)
    q = (
        sdf.writeStream.format("memory")
        .queryName("sc_docs_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    n_docs = spark.table("sc_docs_probe").count()
    assert n_docs >= 400

    from rust_s2_spark.engine import tiling
    from rust_s2_spark.engine.join import cap_join
    from rust_s2_spark.engine.queries import _cap_setup

    regions, coverings, levels = _cap_setup(spark)
    batch = tiling.with_leaf_cellid(ingest.extract_geo(ingest.synth_docs(spark, n_docs, 4)))
    want = cap_join(batch, regions, coverings, id_col="doc_id", levels=levels)
    want_set = {
        (r["region_id"], r["doc_id"])
        for r in want.select("region_id", "doc_id").collect()
    }
    assert got_set == want_set
    assert want_set, "fixture produced no spatial hits — weak test"


def test_stream_dedup_batch_equivalence(spark):
    """Streaming exact dedup (dropDuplicatesWithinWatermark): duplicates
    within the watermark horizon collapse to one row per content key, and
    the surviving key set equals the batch generator's distinct contents."""
    M = 120
    q = streaming.run_stream_dedup_to_memory(
        spark, rows_per_batch=500, distinct_docs=M, query_name="dedup_test"
    )
    rows = spark.table("dedup_test").select("doc_id", "content_key").collect()
    keys = [r["content_key"] for r in rows]
    # exact dedup: one survivor per content
    assert len(keys) == len(set(keys))
    # batch reference: the same fingerprint over the same distinct contents
    batch = ingest.synth_docs(spark, M, 4).withColumn(
        "content_key", F.xxhash64(F.to_json(F.col("spans")))
    )
    want = {r["content_key"] for r in batch.select("content_key").collect()}
    assert set(keys) == want
    assert len(want) == M


def test_stateful_attribution_matches_batch(spark):
    """Streaming as-of attribution across MULTIPLE micro-batches equals the
    batch as-of window composition on the consumed prefix — including
    purchases whose attributed click arrived in an EARLIER micro-batch, and
    first-event purchases with no prior click (NULL columns)."""
    import time

    from rust_s2_spark.engine.streaming import (
        batch_attribution_reference,
        stream_attribution,
    )

    q = (
        stream_attribution(spark, rows_per_batch=160)
        .writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 4:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    consumed = sum(p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0)
    assert consumed >= 640, "needed multiple micro-batches to exercise state"
    got = {tuple(r) for r in spark.table("attr_test").collect()}
    want = {tuple(r) for r in batch_attribution_reference(spark, consumed).collect()}
    assert got == want
    # the scenario actually exercised both interesting paths:
    assert any(r[2] is None for r in got), "no purchase-before-any-click case"
    assert any(r[3] is not None and r[3] > 11 for r in got), (
        "no attribution across a non-adjacent click (gap > one tick)"
    )


def test_stream_checkpoint_recovery(spark, tmp_path):
    """Stop a checkpointed stream and restart from the same
    checkpointLocation: the file sink holds each source row EXACTLY once
    (offset log + sink commit log = exactly-once across restarts) — the
    streaming analog of the batch CheckpointManager crash-resume tests."""
    import time

    from rust_s2_spark.engine.streaming import stream_docs

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        return (
            stream_docs(spark, rows_per_batch=300)
            .selectExpr("doc_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    def wait_batches(q, n, budget=90):
        deadline = time.time() + budget
        while time.time() < deadline:
            if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= n:
                return True
            time.sleep(0.2)
        return False

    q1 = start()
    assert wait_batches(q1, 3), "first run made no progress"
    q1.stop()  # simulated shutdown mid-stream
    q1.awaitTermination(30)

    q2 = start()  # resume from the same checkpoint
    assert wait_batches(q2, 2), "restarted run made no progress"
    q2.stop()
    q2.awaitTermination(30)

    rows = spark.read.parquet(out).select("doc_id").collect()
    ids = sorted(int(r["doc_id"].split("-")[1]) for r in rows)
    assert len(ids) >= 900, "expected several batches across both runs"
    # exactly-once: dense id range with no duplicates and no holes
    assert ids == list(range(len(ids)))


def test_streaming_throughput_floor(spark):
    """Regression canary with a FLOOR: a stateful-operator regression that
    halves the drain rate must fail loudly, not silently.  The bench
    measures ~80k rows/s (tile counts) and ~150k rows/s (attribution) on
    local[32]; this test runs local[4], so the floor is set generously at
    10k rows/s — an order of magnitude of headroom against scheduler noise,
    tight enough to catch a per-row-Python or state-store blowup."""
    import json as _json
    import time

    from rust_s2_spark.engine.streaming import stream_attribution

    def _rows(q):
        total = 0
        for p in q.recentProgress:
            if isinstance(p, str):
                p = _json.loads(p)
            total += int(p.get("numInputRows", 0))
        return total

    def drain_tiles(tag):
        t0 = time.time()
        q = streaming.run_stream_to_memory(
            spark, rows_per_batch=100_000, tile_level=6, query_name=f"floor_t_{tag}"
        )
        dt = time.time() - t0
        rows = _rows(q)
        spark.catalog.dropTempView(f"floor_t_{tag}")
        return rows, dt

    def drain_attr(tag):
        t0 = time.time()
        q = (
            stream_attribution(spark, rows_per_batch=100_000)
            .writeStream.format("memory")
            .queryName(f"floor_a_{tag}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        dt = time.time() - t0
        rows = _rows(q)
        spark.catalog.dropTempView(f"floor_a_{tag}")
        return rows, dt

    def drain_traj(tag):
        from rust_s2_spark.engine.streaming import stream_trajectory

        t0 = time.time()
        q = (
            stream_trajectory(spark, rows_per_batch=100_000)
            .writeStream.format("memory")
            .queryName(f"floor_j_{tag}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        dt = time.time() - t0
        rows = _rows(q)
        spark.catalog.dropTempView(f"floor_j_{tag}")
        return rows, dt

    for drain in (drain_tiles, drain_attr, drain_traj):
        drain("warmup")  # stream startup + state-store init, untimed
        best = max(r / s for r, s in (drain(i) for i in range(2)))
        assert best >= 10_000, f"{drain.__name__}: {best:.0f} rows/s under floor"


def test_stream_line_crossings_matches_batch(spark):
    """Continuous geofence detection across multiple micro-batches equals
    the batch reference EXACTLY: the stateful kernel only reshuffles
    JVM-computed doubles (no arithmetic), and the crossing predicate is
    the literally shared line_crossing_frame Column code — including
    crossings whose step spans a micro-batch boundary."""
    import time

    from rust_s2_spark.engine.streaming import (
        batch_line_crossings_reference,
        stream_line_crossings,
    )

    q = (
        stream_line_crossings(spark, rows_per_batch=200)
        .writeStream.format("memory")
        .queryName("xing_test")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 4:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    consumed = sum(p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0)
    assert consumed >= 800, "needed multiple micro-batches to exercise state"
    got = {tuple(r) for r in spark.table("xing_test").collect()}
    want = {
        tuple(r) for r in batch_line_crossings_reference(spark, consumed).collect()
    }
    assert got == want
    assert len(got) > 0
    # state carryover is load-bearing here: every user's step frame spans
    # batch boundaries (ids are TRAJ_USERS apart), and a dropped/garbage
    # carried point would flip some predicate and break got == want above.
    # Both directions occur whenever the prefix is long enough to matter.
    assert {r[4] for r in got} == {1, -1}


def test_stateful_trajectory_matches_batch(spark):
    """Streaming per-user trajectory steps across MULTIPLE micro-batches
    equal the batch lag-window reference on the consumed prefix — EXACT
    doubles (xyz trig runs JVM-side in both; the state kernel only does
    IEEE -,*,+ in numpy, bit-identical to codegen), including steps whose
    previous point arrived in an EARLIER micro-batch."""
    import time

    from rust_s2_spark.engine.streaming import (
        TRAJ_USERS,
        batch_trajectory_reference,
        stream_trajectory,
    )

    q = (
        stream_trajectory(spark, rows_per_batch=200)
        .writeStream.format("memory")
        .queryName("traj_test")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 4:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    consumed = sum(p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0)
    assert consumed >= 800, "needed multiple micro-batches to exercise state"
    got = {tuple(r) for r in spark.table("traj_test").collect()}
    want = {tuple(r) for r in batch_trajectory_reference(spark, consumed).collect()}
    assert got == want
    # every user contributes steps and none is a first-event ghost
    assert len(got) == consumed - TRAJ_USERS
    assert all(r[3] >= 0.0 for r in got)
    # cross-batch continuity actually exercised: some step's previous event
    # arrived >= one full micro-batch earlier is impossible here (ids are
    # dense per user), but steps DO span the batch boundary: a user's ids
    # are TRAJ_USERS apart, so with rows_per_batch=200 and 25 users every
    # batch boundary splits 25 consecutive (prev, cur) pairs
    boundary = {r for r in got if r[1] // 200 != r[2] // 200}
    assert len(boundary) >= TRAJ_USERS
