"""Checkpoint/lineage + resumable-restart semantics (north-rule contract)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")


def test_materialize_and_resume(spark, tmp_path):
    from pyspark.sql import functions as F

    from rust_s2_spark.engine.checkpoint import CheckpointManager

    ck = CheckpointManager(spark, str(tmp_path))
    calls = {"n": 0}

    def stage():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    r1 = ck.materialize("s1", stage, stage_version="v1")
    assert r1.rows == 100 and not r1.reused and calls["n"] == 1
    m = ck.manifest("s1")
    assert m["total_rows"] == 100
    assert sum(p["rows"] for p in m["partitions"]) == 100

    # resume: same version -> skipped
    r2 = ck.materialize("s1", stage, stage_version="v1")
    assert r2.reused and calls["n"] == 1

    # changed stage version -> recomputed
    r3 = ck.materialize("s1", stage, stage_version="v2")
    assert not r3.reused and calls["n"] == 2

    # lineage fingerprints recorded
    r4 = ck.materialize("s2", lambda: ck.read("s1").where("id < 10"),
                        inputs=["s1"], stage_version="v2")
    assert r4.rows == 10
    assert ck.manifest("s2")["lineage"]["s1"] == ck.manifest("s1")["fingerprint"]


def test_job_restart_skips_completed_stages(spark, tmp_path, capsys):
    """Kill the pipeline mid-way; re-run must reuse completed stages and
    produce identical results (determinism at any parallelism)."""
    import json

    from jobs.spatial_join_job import main

    root = str(tmp_path / "ckpt")
    argv = ["--n-docs", "2000", "--checkpoint-root", root, "--tile-level", "8"]

    with pytest.raises(SystemExit):
        main(argv + ["--fail-after", "geo"])
    capsys.readouterr()

    report = main(argv)
    assert report["stages"]["ingest"]["reused"]
    assert report["stages"]["geo"]["reused"]
    assert not report["stages"]["joined"]["reused"]
    assert report["span_invariant"] == "ok"

    # full re-run: everything reused, same row counts
    report2 = main(argv)
    assert all(s["reused"] for s in report2["stages"].values())
    assert {k: v["rows"] for k, v in report2["stages"].items()} == {
        k: v["rows"] for k, v in report["stages"].items()
    }
