"""End-to-end training-data curation pipeline: the composed production job.

    spark-submit --py-files rust_s2_spark.zip jobs/training_pipeline_job.py \
        --sf-dir /root/testdata/sf0.01 --checkpoint-root /tmp/s2_train_ckpt

Composes the engine's curation operators into one checkpointed, resumable
DAG over the documents / embeddings / events tables — the shape a 100 TB
pretraining-data pipeline takes (each stage materializes to the lakehouse;
a crash resumes from the last committed stage):

  lang_quality   language-ID + quality scoring per doc (pure Catalyst)
  dedup          simhash-collision canonical representative per doc; only
                 canonical docs survive
  curated        quality/language filter joined against the dedup survivors
  geo_cells      geo span extraction -> leaf cellid -> level-8 tile
  tile_stats     curated docs per tile (the training-mix geo balance view)
  geo_density    rook focal sums over the cube topology (own + 4 FACE_WRAP
                 edge-neighbor counts) — the smoothed per-tile density a
                 geo-balanced sampler weights by
  footprint      occupied-tile mask vectorized into boundary rings
                 (raster -> vector: the corpus's geo coverage as geometry)
  ann_buckets    IVF bucket assignment for every embedding (the ANN index
                 build input; bucketed for the similarity scale path)

Every stage records per-partition lineage + row counts via the manifest
layer (engine/checkpoint.py); `--fail-after` simulates crashes for resume
testing, mirroring jobs/spatial_join_job.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_VERSION = "v2"  # v2: footprint stage emits ring geometry (vertex rows)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--checkpoint-root", default="/tmp/s2_train_ckpt")
    ap.add_argument("--tile-level", type=int, default=8)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--fail-after", default=None,
                    choices=["lang_quality", "dedup", "curated", "geo_cells"])
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from rust_s2_spark.engine.checkpoint import CheckpointManager
    from rust_s2_spark.engine.queries import (
        q_geo_extract,
        q_lang_id,
        q_simhash_dedup,
        q_text_stats,
    )
    from rust_s2_spark.engine.session import get_spark

    spark = get_spark(app_name="s2-training-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    ck = CheckpointManager(spark, args.checkpoint_root)
    ver = f"{STAGE_VERSION}:{args.sf_dir}:l{args.tile_level}:t{args.min_tokens}:{args.lang}"
    t0 = time.time()
    report = {"stages": {}}

    def record(res):
        report["stages"][res.name] = {
            "rows": res.rows, "partitions": res.partitions, "reused": res.reused
        }
        return res

    # 1. language ID + quality metrics (one joined table per doc)
    def lang_quality_fn():
        lang = q_lang_id(spark, args.sf_dir).select("doc_id", "predicted")
        stats = q_text_stats(spark, args.sf_dir).select(
            "doc_id", "n_tokens", "avg_wlen"
        )
        return lang.join(stats, "doc_id")

    record(ck.materialize("lang_quality", lang_quality_fn, stage_version=ver))
    if args.fail_after == "lang_quality":
        raise SystemExit("simulated failure after lang_quality")

    # 2. near-dup removal: keep only canonical simhash representatives
    def dedup_fn():
        return q_simhash_dedup(spark, args.sf_dir).where(~F.col("is_dup")).select(
            "doc_id", "simhash"
        )

    record(ck.materialize("dedup", dedup_fn, stage_version=ver))
    if args.fail_after == "dedup":
        raise SystemExit("simulated failure after dedup")

    # 3. curated = quality/language filter ∩ dedup survivors
    def curated_fn():
        lq = ck.read("lang_quality")
        keep = lq.where(
            (F.col("predicted") == args.lang) & (F.col("n_tokens") >= args.min_tokens)
        )
        return keep.join(ck.read("dedup"), "doc_id").select(
            "doc_id", "predicted", "n_tokens", "simhash"
        )

    record(ck.materialize(
        "curated", curated_fn, inputs=["lang_quality", "dedup"], stage_version=ver
    ))
    if args.fail_after == "curated":
        raise SystemExit("simulated failure after curated")

    # 4. geo cells for the curated docs (span extraction -> tile)
    def geo_cells_fn():
        from rust_s2_spark.engine import tiling

        geo = q_geo_extract(spark, args.sf_dir)  # doc_id, lat, lng, cell_l8
        cur = ck.read("curated").select("doc_id")
        g = geo.join(cur, "doc_id")
        return g.withColumn(
            "tile", tiling.parent_col("cell_l8", args.tile_level)
        )

    record(ck.materialize("geo_cells", geo_cells_fn, inputs=["curated"], stage_version=ver))
    if args.fail_after == "geo_cells":
        raise SystemExit("simulated failure after geo_cells")

    # 5. per-tile curated-doc counts (training-mix geographic balance)
    def tile_stats_fn():
        return (
            ck.read("geo_cells")
            .groupBy("tile")
            .agg(F.count("*").alias("n_docs"))
        )

    record(ck.materialize("tile_stats", tile_stats_fn, inputs=["geo_cells"], stage_version=ver))

    # 5b. per-tile density features: rook focal sums over the cube topology
    # (own count + 4 FACE_WRAP edge-neighbor counts) — the smoothed density
    # a geo-balanced sampler weights by.  Grid-bounded input; every shuffle
    # past the tile_stats read touches <= 6*4^L rows at any corpus size.
    def geo_density_fn():
        from rust_s2_spark.engine.tiling import focal_counts

        return focal_counts(ck.read("tile_stats"), n_col="n_docs")

    record(ck.materialize(
        "geo_density", geo_density_fn, inputs=["tile_stats"], stage_version=ver
    ))

    # 6. geographic footprint: vectorize the occupied-tile mask into its
    # boundary rings (raster -> vector) — the curated corpus's geographic
    # coverage as GEOMETRY (shells + holes), not a tile list.  tile_stats is
    # grid-bounded (<= 6*4^L rows at any corpus size), so the driver-side
    # stitch is O(perimeter); the ring table is the lakehouse artifact a
    # downstream sampler or dashboard consumes.
    def footprint_fn():
        from rust_s2_spark.kernel.covering import CellUnion
        from rust_s2_spark.kernel.vectorize import cellunion_boundary

        tiles = sorted(
            r["tile"] & 0xFFFFFFFFFFFFFFFF
            for r in ck.read("tile_stats").select("tile").collect()
        )
        poly = cellunion_boundary(CellUnion(tiles), args.tile_level)
        # the ACTUAL geometry, one row per ring vertex in interior-left
        # order (shells CCW at even depth, holes CW at odd) — Polygon
        # stores holes re-inverted, so odd depths are reversed back here.
        # A downstream sampler or dashboard reconstructs the boundary
        # from these rows.
        rows = [
            (k, int(lp.depth), s, float(v[0]), float(v[1]), float(v[2]))
            for k, lp in enumerate(poly.loops)
            for s, v in enumerate(
                lp.vertices[::-1] if lp.depth % 2 else lp.vertices
            )
        ]
        return spark.createDataFrame(
            rows, "ring_id int, depth int, seq int, x double, y double, z double"
        )

    record(ck.materialize("footprint", footprint_fn, inputs=["tile_stats"], stage_version=ver))

    # 7. IVF bucket assignment for the embeddings (ANN index build input)
    def ann_buckets_fn():
        from pyspark.sql.functions import pandas_udf

        emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        cent_rows = (
            emb.where(F.col("vec_id") < 16).orderBy("vec_id").select("embedding").collect()
        )
        cents = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
        bc = spark.sparkContext.broadcast(cents)

        @pandas_udf("int")
        def _bucket(e: pd.Series) -> pd.Series:
            m = np.array(e.tolist(), dtype=np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            return pd.Series(np.argmax(m @ bc.value.T, axis=1).astype(np.int32))

        return emb.select("vec_id", _bucket("embedding").alias("bucket"))

    record(ck.materialize(
        "ann_buckets", ann_buckets_fn, stage_version=ver, partition_by=["bucket"]
    ))

    report["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
