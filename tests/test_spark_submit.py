"""spark-submit --py-files shipping gate: the production launch command,
run for real.

The job is copied OUT of the repo into a temp dir and launched from there
with a scrubbed PYTHONPATH, so its own ``sys.path.insert(repo_root)``
resolves to an empty temp parent — the ONLY way ``rust_s2_spark`` can
import is from the ``--py-files`` zip built by this test (the exact
artifact the job docstrings ship).  A crash-free run with committed
manifests therefore proves the package zips complete and self-contained:
no repo-relative data files, no import-time cwd assumptions.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not available")


def _build_zip(repo: str, zpath: str) -> None:
    """Package rust_s2_spark/ exactly as `zip -r rust_s2_spark.zip
    rust_s2_spark` would — top-level package dir inside the archive."""
    pkgroot = os.path.join(repo, "rust_s2_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkgroot):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, repo))


def test_spark_submit_py_files_ships_package(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "rust_s2_spark.zip")
    _build_zip(repo, zpath)

    jobdir = tmp_path / "jobs"
    jobdir.mkdir()
    shutil.copy(
        os.path.join(repo, "jobs", "spatial_join_job.py"), str(jobdir / "job.py")
    )
    ckpt = tmp_path / "ckpt"

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only import source

    cmd = [
        _spark_submit(),
        "--master",
        "local[4]",
        "--conf",
        "spark.sql.shuffle.partitions=8",
        "--conf",
        "spark.ui.enabled=false",
        "--py-files",
        zpath,
        str(jobdir / "job.py"),
        "--n-docs",
        "4000",
        "--tile-level",
        "8",
        "--checkpoint-root",
        str(ckpt),
    ]
    r = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])

    # the job's final line is its JSON report
    report = None
    for line in r.stdout.strip().splitlines()[::-1]:
        if not line.lstrip().startswith("{"):
            continue  # a bare JSON scalar on a later line is not the report
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(cand, dict) and "stages" in cand:
            report = cand
            break
    assert report is not None, r.stdout[-2000:]
    stages = report["stages"]
    assert set(stages) == {"ingest", "geo", "joined", "rollup"}
    assert all(not s["reused"] for s in stages.values())
    assert stages["ingest"]["rows"] == 4000
    assert stages["geo"]["rows"] == 4000  # geo keeps every doc

    # committed manifests with per-partition lineage on disk
    manifests = sorted(glob.glob(str(ckpt / "*" / "_MANIFEST.json")))
    assert len(manifests) == 4
    m = json.load(open(manifests[0]))
    assert m["total_rows"] > 0 and len(m["partitions"]) > 0
