"""Hilbert-clustered table layout: the storage-side half of the spatial
engine.

A 100 TB table is only as fast as what a query can SKIP.  CellIDs are
positions on a space-filling curve, so sorting a table by ``cell_id``
makes every parquet row group cover a compact curve interval — its
min/max column statistics become tight cell ranges, and any covering
join or tile-range scan (``cell_id BETWEEN range_min AND range_max``)
prunes all but the touched row groups at the file-footer level, before a
single data page is read.  This is the same reason the reference orders
its spatial indexes by cellid (cellid.rs: "the curve preserves
locality"); on Spark the layout IS the index.

``write_clustered`` uses ``repartitionByRange`` + ``sortWithinPartitions``
so the ordering is global across files (each file owns one curve
interval), not just within files.  At cluster scale the range exchange
samples the key distribution, so skewed geographies still yield
balanced files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_clustered"]


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str = "cell_id",
    n_files: int | None = None,
    rows_per_file: int | None = None,
    rows_per_group: int | None = None,
    bytes_per_row_hint: int = 64,
) -> None:
    """Write ``df`` as parquet globally sorted by ``cluster_col``.

    ``rows_per_file`` caps rows per output FILE (the DataFrameWriter's
    ``maxRecordsPerFile``); a file that hits the cap is split, each split
    keeping the sort.  ``rows_per_group`` targets rows per parquet ROW
    GROUP — parquet's group sizing is byte-based, so the target is
    translated to ``parquet.block.size ≈ rows_per_group *
    bytes_per_row_hint`` (smaller groups = finer footer-level skipping at
    slightly more metadata overhead).  Omit both to leave parquet's
    default block sizing alone.
    """
    out = df.repartitionByRange(
        n_files or df.sparkSession.sparkContext.defaultParallelism, cluster_col
    ).sortWithinPartitions(cluster_col)
    writer = out.write.mode("overwrite")
    if rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(rows_per_file))
    if rows_per_group is not None:
        block = max(1024, rows_per_group * bytes_per_row_hint)
        writer = writer.option("parquet.block.size", str(block))
    writer.parquet(path)
