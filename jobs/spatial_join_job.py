"""End-to-end spatial-join pipeline: the spark-submit production entry.

    spark-submit --py-files rust_s2_spark.zip jobs/spatial_join_job.py \
        --n-docs 1000000 --tile-level 10 --checkpoint-root /tmp/s2_ckpt

Stages (each checkpointed with per-partition lineage + row counts; a restart
skips completed stages — kill it anywhere and re-run the same command):

  ingest    synthetic interleaved text+media docs (deterministic)
  geo       span-geo extraction (pure Catalyst) + leaf cellid + tile column
  joined    cap-containment spatial join against the spec regions
  rollup    docs per (region, tile) metrics

The span-sequence invariant (kind, text, media_ref, order) is asserted
between ingest and the geo checkpoint via per-doc signatures.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_VERSION = "v1"  # bump to invalidate all checkpoints on logic change


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--tile-level", type=int, default=10)
    ap.add_argument("--checkpoint-root", default="/tmp/s2_ckpt")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--salt", type=int, default=None, help="hot-cell salt factor")
    ap.add_argument("--skip-invariant", action="store_true")
    ap.add_argument("--fail-after", default=None, choices=["ingest", "geo", "joined"],
                    help="testing: crash after this stage commits (simulated failure)")
    ap.add_argument("--no-checkpoint", action="store_true",
                    help="single-pass mode: run the whole pipeline as one DAG "
                         "with a noop sink (compute-throughput benchmarking; "
                         "no durability, no resume)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from rust_s2_spark.engine import ingest, specs, tiling
    from rust_s2_spark.engine.checkpoint import CheckpointManager
    from rust_s2_spark.engine.join import cap_join
    from rust_s2_spark.engine.queries import _cap_setup
    from rust_s2_spark.engine.session import get_spark

    spark = get_spark(app_name="s2-spatial-join")
    spark.sparkContext.setLogLevel("WARN")

    if args.no_checkpoint:
        # query prep (region coverings) is once-per-query-definition work,
        # independent of data volume — excluded from the timed window
        regions, coverings, levels = _cap_setup(spark)

        def pipeline(n_docs: int):
            docs = ingest.synth_docs(spark, n_docs, args.partitions)
            g = tiling.with_leaf_cellid(ingest.extract_geo(docs))
            g = g.withColumn("tile", tiling.parent_col("cell_id", args.tile_level))
            j = cap_join(g, regions, coverings, id_col="doc_id", levels=levels,
                         salt=args.salt)
            rollup = j.groupBy("region_id", "tile").agg(F.count("*").alias("n_docs"))
            rollup.write.format("noop").mode("overwrite").save()

        # warm-up: spawn every python worker + JIT the stages (untimed; a
        # production job amortizes this over hours, a benchmark must not
        # charge it to one configuration more than another)
        pipeline(min(args.n_docs, 200_000))
        t0 = time.time()
        pipeline(args.n_docs)
        wall = time.time() - t0
        report = {"mode": "single-pass", "wall_sec": round(wall, 3),
                  "docs_per_sec": round(args.n_docs / wall, 1)}
        print(json.dumps(report))
        return report

    ck = CheckpointManager(spark, args.checkpoint_root)
    ver = f"{STAGE_VERSION}:n{args.n_docs}:l{args.tile_level}"
    t0 = time.time()
    report = {"stages": {}}

    def record(res):
        report["stages"][res.name] = {
            "rows": res.rows, "partitions": res.partitions, "reused": res.reused
        }
        return res

    # 1. ingest
    r_ingest = record(ck.materialize(
        "ingest",
        lambda: ingest.synth_docs(spark, args.n_docs, args.partitions),
        stage_version=ver,
    ))
    if args.fail_after == "ingest":
        raise SystemExit("simulated failure after ingest")

    # 2. geo extraction + tiling (keeps spans so the invariant is checkable)
    def geo_fn():
        docs = ck.read("ingest")
        g = ingest.extract_geo(docs, keep_spans=True)
        g = tiling.with_leaf_cellid(g)
        return g.withColumn("tile", tiling.parent_col("cell_id", args.tile_level))

    r_geo = record(ck.materialize("geo", geo_fn, inputs=["ingest"], stage_version=ver))

    if not args.skip_invariant:
        ingest.assert_span_invariant(ck.read("ingest"), ck.read("geo"))
        report["span_invariant"] = "ok"
    if args.fail_after == "geo":
        raise SystemExit("simulated failure after geo")

    # 3. spatial join (covering prefilter + exact refine)
    def join_fn():
        docs = ck.read("geo").drop("spans")
        regions, coverings, levels = _cap_setup(spark)
        return cap_join(docs, regions, coverings, id_col="doc_id",
                        levels=levels, salt=args.salt)

    r_join = record(ck.materialize("joined", join_fn, inputs=["geo"], stage_version=ver))
    if args.fail_after == "joined":
        raise SystemExit("simulated failure after joined")

    # 4. per-(region, tile) rollup — Hilbert-ordered write clustering
    def rollup_fn():
        j = ck.read("joined")
        return (
            j.groupBy("region_id", "tile")
            .agg(F.count("*").alias("n_docs"))
            .repartitionByRange(8, "tile")
            .sortWithinPartitions("tile")
        )

    record(ck.materialize("rollup", rollup_fn, inputs=["joined"], stage_version=ver))

    report["wall_sec"] = round(time.time() - t0, 3)
    report["docs_per_sec"] = round(args.n_docs / report["wall_sec"], 1)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
