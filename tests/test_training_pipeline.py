"""End-to-end training-data curation job: stage composition + crash resume
(jobs/training_pipeline_job.py)."""

from __future__ import annotations

import shutil

import pytest

from jobs import training_pipeline_job as job

ROOT = "/tmp/s2_train_pytest"
SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ckroot(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    yield ROOT
    shutil.rmtree(ROOT, ignore_errors=True)


def test_pipeline_runs_and_resumes(spark, ckroot):
    args = ["--sf-dir", SF, "--checkpoint-root", ckroot]
    # crash mid-pipeline after the dedup stage commits
    with pytest.raises(SystemExit):
        job.main(args + ["--fail-after", "dedup"])
    # full re-run: committed stages are reused, the rest compute fresh
    report = job.main(args)
    st = report["stages"]
    assert st["lang_quality"]["reused"] and st["dedup"]["reused"]
    assert not st["curated"]["reused"]
    # pipeline semantics: monotone narrowing from docs -> curated
    assert st["lang_quality"]["rows"] == 500
    assert 0 < st["dedup"]["rows"] <= 500
    assert 0 < st["curated"]["rows"] <= st["dedup"]["rows"]
    assert st["geo_cells"]["rows"] == st["curated"]["rows"]
    assert 0 < st["tile_stats"]["rows"] <= st["geo_cells"]["rows"]
    # geo_density: one focal row per occupied tile; focal sum >= own count,
    # and summing n over the emitted rows conserves the doc->tile mass
    assert st["geo_density"]["rows"] == st["tile_stats"]["rows"]
    gd = spark.read.parquet(f"{ckroot}/geo_density")
    dens = gd.collect()
    assert all(r["focal_n"] >= r["n"] > 0 for r in dens)
    assert sum(r["n"] for r in dens) == st["geo_cells"]["rows"]
    # footprint: actual ring GEOMETRY (one row per boundary vertex) —
    # every ring has >= 4 unit-vector vertices in contiguous seq order
    assert st["footprint"]["rows"] >= 4
    fp = spark.read.parquet(f"{ckroot}/footprint")
    import numpy as np

    by_ring: dict = {}
    for r in fp.collect():
        by_ring.setdefault(r["ring_id"], []).append(r)
    assert by_ring
    for rid, vs in by_ring.items():
        assert len(vs) >= 4
        assert sorted(r["seq"] for r in vs) == list(range(len(vs)))
        for r in vs:
            assert abs(r["x"] ** 2 + r["y"] ** 2 + r["z"] ** 2 - 1.0) < 1e-12
    assert st["ann_buckets"]["rows"] == 500
    # a third run reuses everything (fully resumable, idempotent)
    report3 = job.main(args)
    assert all(s["reused"] for s in report3["stages"].values())
    assert {k: v["rows"] for k, v in report3["stages"].items()} == {
        k: v["rows"] for k, v in st.items()
    }
    # curated output joins only dedup-canonical docs
    cur = spark.read.parquet(f"{ckroot}/curated")
    ded = spark.read.parquet(f"{ckroot}/dedup")
    assert cur.join(ded, "doc_id").count() == cur.count()
