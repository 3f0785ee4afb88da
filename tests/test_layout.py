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


def test_rows_per_file_and_group_knobs(spark, tmp_path):
    """rows_per_file caps per-FILE row counts (maxRecordsPerFile);
    rows_per_group shrinks parquet row groups via the derived block size."""
    df = events_geo(spark, SF).select("event_id", "cell_id")
    n = df.count()
    capped = str(tmp_path / "capped")
    write_clustered(df, capped, n_files=4, rows_per_file=200)
    per_file = [
        pq.ParquetFile(f).metadata.num_rows for f in glob.glob(capped + "/*.parquet")
    ]
    assert sum(per_file) == n
    assert max(per_file) <= 200
    assert len(per_file) >= n // 200  # the cap actually split files

    fine = str(tmp_path / "fine")
    write_clustered(df, fine, n_files=2, rows_per_group=100, bytes_per_row_hint=16)
    groups = [
        pq.ParquetFile(f).metadata.row_group(g).num_rows
        for f in glob.glob(fine + "/*.parquet")
        for g in range(pq.ParquetFile(f).metadata.num_row_groups)
    ]
    assert sum(groups) == n
    # finer than the single-default-block layout: multiple groups per file,
    # and the global sort still yields disjoint group ranges
    assert len(groups) > 2
    spans = _rowgroup_ranges(fine + "/*.parquet")
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_cap_join_clustered_prunes_and_matches(spark, tmp_path):
    """The clustered cap-join variant returns exactly s2_cap_join's rows,
    pushes its cell_id range disjunction into the parquet scan, and the
    sorted layout means only a small fraction of row groups can match."""
    from rust_s2_spark.engine.queries import (
        _cap_cov_rows,
        _merged_ranges,
        q_cap_join,
        q_cap_join_clustered,
    )

    got = q_cap_join_clustered(spark, SF)
    want = q_cap_join(spark, SF)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._sc._jvm.PythonSQLUtils.explainString(got._jdf.queryExecution(), "formatted")
    scan = next(s for s in plan.split("\n\n") if "PushedFilters" in s and "cell_id" in s)
    assert "GreaterThanOrEqual(cell_id" in scan and "LessThanOrEqual(cell_id" in scan

    # footer-level skipping needs group span << curve: demonstrate at sf0.01
    # (10k rows) with fine groups — the covering ranges (5.3% of the curve)
    # touch a small minority of sorted groups but ~every random-layout group
    from rust_s2_spark.engine.queries import events_geo

    ranges = _merged_ranges(tuple(_cap_cov_rows()))
    df01 = events_geo(spark, "/root/testdata/sf0.01").select("event_id", "cell_id")
    c01, u01 = str(tmp_path / "c01"), str(tmp_path / "u01")
    write_clustered(df01, c01, n_files=4, rows_per_group=128, bytes_per_row_hint=16)
    df01.repartition(4).write.mode("overwrite").option(
        "parquet.block.size", "2048"
    ).parquet(u01)

    def frac_touched(path):
        spans = _rowgroup_ranges(path + "/*.parquet")
        touched = sum(
            1 for s_lo, s_hi in spans if any(not (s_hi < lo or s_lo > hi) for lo, hi in ranges)
        )
        return touched / len(spans)

    assert frac_touched(c01) <= 0.25, "clustered layout should skip most groups"
    assert frac_touched(u01) >= 0.9, "random layout touches ~every group"


def test_rect_pip_join_use_clustered_scan(spark):
    """The clustered scan is the DEFAULT spatial docs side: rect and pip
    joins read the sorted layout with their coverings' merged cell_id
    ranges pushed into the parquet scan."""
    from rust_s2_spark.engine.queries import q_pip_join, q_rect_join

    for q in (q_rect_join, q_pip_join):
        df = q(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        scan = next(
            s for s in plan.split("\n\n") if "PushedFilters" in s and "cell_id" in s
        )
        assert "GreaterThanOrEqual(cell_id" in scan
        assert "LessThanOrEqual(cell_id" in scan
        assert "events_geo" in scan  # the clustered materialization path
