"""Stage checkpointing with per-partition lineage + row-count metrics.

North-rule contract: every pipeline stage checkpoints to a table with
per-partition lineage and row-count metrics, and a restarted job skips
completed stages (resumable restarts).

Storage: Iceberg when the runtime ships the iceberg-spark runtime jar
(``format="iceberg"``); this sandbox has no jar, so the default writes
parquet + a JSON manifest with identical semantics (atomic via
write-then-rename of the manifest; a stage is complete iff its manifest
exists).  The manifest records:

- per-partition row counts (computed distributedly, one count per task),
- lineage: input stage names + their manifest fingerprints,
- the engine git-ish content token of the writing stage (stage_version) so a
  changed stage invalidates its checkpoint.

At 100 TB the same structure holds: the manifest is tiny (one row per
partition), written by the driver after the data commit, and restart cost is
one manifest read per stage.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CheckpointManager", "StageResult"]

MANIFEST = "_MANIFEST.json"


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    partitions: int
    reused: bool
    manifest: dict = field(repr=False, default_factory=dict)


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.fmt = fmt
        os.makedirs(self.root, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------

    def _dir(self, name: str) -> str:
        return f"{self.root}/{name}"

    def _manifest_path(self, name: str) -> str:
        return f"{self._dir(name)}/{MANIFEST}"

    def manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, name: str, stage_version: str = "") -> bool:
        m = self.manifest(name)
        return m is not None and m.get("stage_version", "") == stage_version

    # -- core API -----------------------------------------------------------

    def materialize(
        self,
        name: str,
        df_fn,
        inputs: list[str] | None = None,
        stage_version: str = "",
        partition_by: list[str] | None = None,
    ) -> StageResult:
        """Run ``df_fn() -> DataFrame`` and checkpoint it, or reuse.

        ``inputs`` are upstream stage names; their manifest fingerprints are
        recorded as lineage.  If this stage's manifest already exists with the
        same stage_version, the stage is skipped and read back (resume path).
        """
        path = self._dir(name)
        if self.is_complete(name, stage_version):
            m = self.manifest(name)
            return StageResult(
                name, path, m["total_rows"], len(m["partitions"]), True, m
            )

        df = df_fn()
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(self.fmt).save(path)

        # Per-partition row counts of what was written — one count per file
        # task, computed distributedly on the re-read (so it reflects the
        # committed bytes, not the pre-write plan).
        back = self.spark.read.format(self.fmt).load(path)
        counts = (
            back.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        partitions = sorted((int(r["pid"]), int(r["count"])) for r in counts)
        total = sum(c for _, c in partitions)

        lineage = {}
        for up in inputs or []:
            um = self.manifest(up)
            lineage[up] = um.get("fingerprint") if um else None

        m = {
            "stage": name,
            "stage_version": stage_version,
            "format": self.fmt,
            "total_rows": total,
            "partitions": [{"pid": p, "rows": c} for p, c in partitions],
            "lineage": lineage,
            "wall_sec": round(time.time() - t0, 3),
            "written_at": time.time(),
            "fingerprint": f"{name}:{total}:{len(partitions)}:{stage_version}",
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path(name))  # atomic commit marker
        return StageResult(name, path, total, len(partitions), False, m)

    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self._dir(name))

    def invalidate(self, name: str) -> None:
        p = self._manifest_path(name)
        if os.path.exists(p):
            os.remove(p)
