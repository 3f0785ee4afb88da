"""Headline benchmark: runs the engine's flagship queries end-to-end.

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a noop write (count() would let Catalyst
prune the geometry UDFs away).  Throughput for the tiling stage is reported as
docs/sec in the extras.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "s2_tile_assign",
    "s2_cap_join",
    "s2_rect_join",
    "s2_pip_join",
    "s2_poly_nested_join",
    "s2_poly_overlay_join",
    "s2_coastline_join",
    "s2_rasterize",
    "s2_knn",
    "s2_segment_distance",
    "dedup_exact",
    "ngram_jaccard",
    "simhash",
    "simhash_dedup",
    "ann_cosine",
    "embed_dedup",
    "span_pipeline",
    "pricing_summary",
    "sessionize",
]


def run(spark, sf_dir: str, names=None, repeats: int = 1):
    """Cold times per query; with repeats > 1 also the best warm repeat
    (steady-state: plan/codegen caches hot, python workers spawned)."""
    from rust_s2_spark.engine.queries import QUERIES

    times, warm = {}, {}
    for name in names or HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        if repeats > 1:
            best = None
            for _ in range(repeats - 1):
                t1 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t1
                best = dt if best is None else min(best, dt)
            warm[name] = round(best, 3)
    return times, warm


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rust_s2_spark.engine.session import get_spark

    spark = get_spark(app_name="rust-s2-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + UDF workers once (excluded from timings)
    from rust_s2_spark.engine.queries import QUERIES

    QUERIES["s2_tile_assign"](spark, sf_dir).limit(10).collect()
    # warmup primes the memoized tiled-events table; clear it so the first
    # timed query pays the materialization cost honestly (later queries
    # legitimately share it — that is the materialized-ingest design)
    from rust_s2_spark.engine.queries import clear_geo_cache

    clear_geo_cache()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1"))
    times, warm = run(spark, sf_dir, repeats=repeats)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline query suite wall time (spatial join + tiling + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "tile_docs_per_sec": round(n_events / times["s2_tile_assign"], 1),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    if warm:
        out["queries_warm"] = warm
        out["warm_total_sec"] = round(sum(warm.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
