"""Structured Streaming: continuous doc ingest -> tiling -> windowed rollups.

The reference has no streaming surface; this is the engine's idiomatic
extension of the same operators to unbounded input:

- source: ``rate-micro-batch`` (deterministic batches) whose ``value`` feeds
  the exact batch generator expressions (``ingest.doc_cols``), so streamed
  docs are byte-identical to batch docs with the same index;
- geo extraction + leaf-cellid UDF + tile bit-math are the *same* Columns
  and pandas UDF as the batch path (pandas UDFs run per micro-batch);
- event-time windowed per-tile counts with a watermark bound late data;
  checkpointLocation gives exactly-once sink semantics — the streaming
  analog of the batch CheckpointManager lineage.

At scale this is the continuous-ingest deployment: Kafka source instead of
rate-micro-batch (swap ``readStream.format``), Iceberg streaming sink
instead of memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ingest, tiling

__all__ = ["stream_docs", "stream_tile_counts", "run_stream_to_memory"]


def stream_docs(spark: SparkSession, rows_per_batch: int = 1000) -> DataFrame:
    """Unbounded deterministic doc stream: (ts, doc_id, spans)."""
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    doc_id, spans = ingest.doc_cols(F.col("value"))
    return src.select(
        F.col("timestamp").alias("ts"), doc_id.alias("doc_id"), spans.alias("spans")
    )


def stream_tile_counts(
    docs: DataFrame,
    tile_level: int = 6,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Windowed per-tile doc counts with late-data watermark."""
    geo_text = F.filter("spans", lambda s: s["kind"] == F.lit("geo"))[0]["text"]
    parts = F.split(geo_text, ":")
    g = docs.withWatermark("ts", watermark).select(
        "ts",
        "doc_id",
        parts[0].cast("double").alias("lat"),
        parts[1].cast("double").alias("lng"),
    )
    g = tiling.with_leaf_cellid(g)
    g = g.withColumn("tile", tiling.parent_col("cell_id", tile_level))
    return g.groupBy(F.window("ts", window).alias("win"), F.col("tile")).agg(
        F.count("*").alias("n_docs")
    )


def run_stream_to_memory(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    tile_level: int = 6,
    query_name: str = "tile_counts",
):
    """Drain the currently-available micro-batches into a memory sink.

    ``availableNow`` processes what the deterministic source has produced and
    terminates — the bounded-run harness for an unbounded pipeline.  Results
    readable from the ``query_name`` in-memory table.
    """
    counts = stream_tile_counts(stream_docs(spark, rows_per_batch), tile_level)
    q = (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q
