"""Distributed kNN via cap-covering candidate generation (cell-ring search).

The brute-force baseline (queries x all docs + window top-k) is exact but
scans everything; at 10^12 docs the scan must be pruned spatially.  This is
the covering analog of the reference's (absent) ClosestEdgeQuery
(shape_index.rs:624): per query point, grow a cap until it provably holds k
candidates, then refine only the covering join's candidates.

Correctness argument (exactness, not approximation): a neighbor can be
missed only if it lies outside the final cap; the loop only stops once
>= k candidates lie strictly *within the cap radius* (not merely inside
covering cells), so the true k nearest are all within that radius and the
covering join — which over-covers the cap — surfaced every one of them.

Scale shape: each round is one broadcast covering equi-join + a per-query
count; rounds are O(log max_radius); queries are few (broadcast side), docs
never shuffle.  In production the doc table stores its cellid column
(tile-partitioned), so each round's scan prunes to the covering cells'
partitions; locally the per-round re-tiling makes brute force look faster
at toy sizes — the crossover is where scan cost dominates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..kernel import hierarchy as h
from ..kernel.covering import RegionCoverer
from ..kernel.region import Cap
from .join import covering_join

import numpy as np

_COVER_SCHEMA = (
    "region_id string, cover_cell long, cover_level int, range_min long, range_max long"
)


def _cap_cover_rows(qid: str, cx: float, cy: float, cz: float, radius_rad: float, coverer):
    s = math.sin(0.5 * min(radius_rad, math.pi))
    cap = Cap(np.array([cx, cy, cz]), 4.0 * s * s)
    rows = []
    for cid in coverer.covering(cap).ids:
        u = np.uint64(cid)
        rows.append(
            (qid, int(np.int64(u)), int(h.level(u)), int(np.int64(h.range_min(u))), int(np.int64(h.range_max(u))))
        )
    return rows


def knn_cellring(
    spark: SparkSession,
    docs_tiled: DataFrame,
    queries: list[tuple[str, float, float, float]],
    k: int,
    init_radius_deg: float = 1.0,
    id_col: str = "doc_id",
    max_rounds: int = 12,
) -> DataFrame:
    """queries: (query_id, qx, qy, qz) unit vectors.  Returns
    (query_id, id_col, rank, d2) for the exact k nearest docs per query."""
    coverer = RegionCoverer(max_cells=12)
    # Persist the tiled+projected frame once: the ring search re-scans it
    # every round (at 100 TB this is the materialized tiled table), and the
    # InMemoryRelation boundary also stops Catalyst from re-substituting the
    # pure-Column Hilbert encode into each round's range filters.
    docs_tiled = docs_tiled.select(id_col, "cell_id", "lat", "lng").persist()
    px = F.cos(F.radians("lat")) * F.cos(F.radians("lng"))
    py = F.cos(F.radians("lat")) * F.sin(F.radians("lng"))
    pz = F.sin(F.radians("lat"))

    pending = {qid: init_radius_deg for qid, *_ in queries}
    qvec = {qid: (cx, cy, cz) for qid, cx, cy, cz in queries}
    results = []  # per-query candidate DataFrames

    for _ in range(max_rounds):
        if not pending:
            break
        cov_rows = []
        qrows = []
        for qid, rdeg in pending.items():
            cx, cy, cz = qvec[qid]
            cov_rows.extend(_cap_cover_rows(qid, cx, cy, cz, math.radians(rdeg), coverer))
            s = math.sin(0.5 * min(math.radians(rdeg), math.pi))
            qrows.append((qid, cx, cy, cz, 4.0 * s * s))
        coverings = spark.createDataFrame(cov_rows, _COVER_SCHEMA).withColumnRenamed(
            "region_id", "query_id"
        )
        qdf = spark.createDataFrame(
            qrows, "query_id string, qx double, qy double, qz double, r2 double"
        )
        levels = sorted({r[2] for r in cov_rows})
        cand = covering_join(
            docs_tiled,
            coverings.withColumnRenamed("query_id", "region_id"),
            id_col=id_col,
            levels=levels,
        ).withColumnRenamed("region_id", "query_id")
        cand = cand.join(F.broadcast(qdf), on="query_id")
        d2 = (px - F.col("qx")) ** 2 + (py - F.col("qy")) ** 2 + (pz - F.col("qz")) ** 2
        cand = cand.withColumn("d2", d2)
        # count candidates strictly within the verified cap radius
        counts = {
            r["query_id"]: r["n"]
            for r in cand.where(F.col("d2") <= F.col("r2"))
            .groupBy("query_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        done = [qid for qid in pending if counts.get(qid, 0) >= k]
        if done:
            done_set = set(done)
            results.append(
                cand.where(F.col("query_id").isin(done) & (F.col("d2") <= F.col("r2"))).select(
                    "query_id", id_col, "d2"
                )
            )
            for qid in done:
                del pending[qid]
        for qid in list(pending):
            pending[qid] = pending[qid] * 2.0
    if pending:
        raise RuntimeError(f"kNN did not converge for {sorted(pending)} — raise max_rounds")

    allc = results[0]
    for r in results[1:]:
        allc = allc.unionByName(r)
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col(id_col).asc())
    return (
        allc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "d2")
    )
