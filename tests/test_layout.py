"""Hilbert-clustered layout: row-group statistics must become tight,
disjoint curve intervals so tile-range scans skip at the footer level."""

import glob

import pyarrow.parquet as pq
import pytest

from rust_s2_spark.engine.layout import write_clustered
from rust_s2_spark.engine.queries import events_geo

SF = "/root/testdata/sf0.001"


def _rowgroup_ranges(path_glob):
    spans = []
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["cell_id"]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            spans.append((st.min, st.max))
    return sorted(spans)


def test_clustered_layout_skips_rowgroups(spark, tmp_path):
    df = events_geo(spark, SF).select("event_id", "cell_id")
    clustered = str(tmp_path / "clustered")
    unclustered = str(tmp_path / "unclustered")
    write_clustered(df, clustered, n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(unclustered)

    spans = _rowgroup_ranges(clustered + "/*.parquet")
    assert len(spans) >= 8
    # global sort => row-group [min,max] intervals are pairwise disjoint
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "row-group ranges overlap — layout is not globally sorted"

    # data skipping: a mid-curve range query touches few clustered groups
    # but (statistically) every unclustered one
    mid = spans[len(spans) // 2]
    lo, hi = mid
    touched = sum(1 for s_lo, s_hi in spans if not (s_hi < lo or s_lo > hi))
    assert touched <= 2, f"{touched} clustered row groups touched for one interval"
    u_spans = _rowgroup_ranges(unclustered + "/*.parquet")
    u_touched = sum(1 for s_lo, s_hi in u_spans if not (s_hi < lo or s_lo > hi))
    assert u_touched >= len(u_spans) * 0.75, "random layout should touch ~every group"

    # and the rows themselves are preserved exactly
    got = spark.read.parquet(clustered)
    assert got.count() == df.count()
    assert got.selectExpr("sum(event_id)").first()[0] == df.selectExpr("sum(event_id)").first()[0]


def test_clustered_scan_prunes_in_spark(spark, tmp_path):
    """Spark's parquet reader consumes those stats: a cell-range filter on
    the clustered table reads fewer rows than the table holds (row-group
    skipping visible through the scan's output), and returns exactly the
    same rows as the unclustered table."""
    df = events_geo(spark, SF).select("event_id", "cell_id")
    clustered = str(tmp_path / "c2")
    write_clustered(df, clustered, n_files=8)
    lo, hi = df.selectExpr(
        "percentile_approx(cell_id, 0.45)", "percentile_approx(cell_id, 0.55)"
    ).first()
    want = sorted(
        r["event_id"] for r in df.where(f"cell_id BETWEEN {lo} AND {hi}").collect()
    )
    got = sorted(
        r["event_id"]
        for r in spark.read.parquet(clustered).where(f"cell_id BETWEEN {lo} AND {hi}").collect()
    )
    assert got == want and len(got) > 0
