"""Local replica of the driver's correctness gate.

Runs each __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB against the same sf dir, then compares row count, column names, and
values (rows sorted by all columns; doubles compared exactly, with max-diff
diagnostics on mismatch).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if problems:
        return problems
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                bad = (~eq).sum()
                md = np.nanmax(np.abs(av - bv))
                problems.append(f"col {c}: {bad} value diffs, maxdiff={md:.3e}")
        else:
            eq = pd.Series(av).eq(pd.Series(bv)) | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                bad = int((~eq).sum())
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"col {c}: {bad} diffs, first at row {i}: spark={av[i]!r} oracle={bv[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from rust_s2_spark.engine.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_conn(sf_dir)

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"okNC {name}: rows={len(sdf)} (rows-only, {t1 - t0:.1f}s)")
            if len(sdf) == 0:
                print(f"  WARN {name}: empty result")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: rows={len(sdf)} ({t1 - t0:.1f}s)")
            for p in problems:
                print(f"  - {p}")
        else:
            n_pass += 1
            tag = " (EMPTY!)" if len(sdf) == 0 else ""
            print(f"PASS {name}: rows={len(sdf)} ({t1 - t0:.1f}s){tag}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
