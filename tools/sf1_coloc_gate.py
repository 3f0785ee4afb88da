"""sf1 gate for s2_colocation_join: exact order-independent aggregates.

At sf1 the co-location output is tens of millions of rows — the standard
check_oracles gate collects BOTH engines' full row sets onto one driver for
the hash compare, which is the wrong tool at that size (the collect, not the
query, fails).  This gate compares the two engines on exact integer
aggregates instead, all order-independent, so agreement at equal row counts
is as strong as a row-set hash:

- n_pairs                       (count)
- sum(dt_us)                    (exact int64 inputs, DECIMAL/HUGEINT sum —
                                 the plain BIGINT sum would overflow ~2^63)
- sum(round(chord2_r * 1e7))    (the scaled-integer distance checksum)
- sum(event_a), sum(event_b)    (membership checksums)
- count(DISTINCT user_a)        (side identity)

Usage: python tools/sf1_coloc_gate.py [sf_dir]   (default /tmp/spark_graft/sf1)
Writes CORRECTNESS_sf1_coloc.json on success.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def spark_aggs(sf_dir: str):
    from pyspark.sql import functions as F

    from rust_s2_spark.engine.queries import QUERIES
    from rust_s2_spark.engine.session import get_spark

    spark = get_spark()
    df = QUERIES["s2_colocation_join"](spark, sf_dir)
    row = df.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("dt_us").cast("decimal(38,0)")).alias("sum_dt_us"),
        F.sum(F.round(F.col("chord2_r") * F.lit(1e7), 0).cast("long")).alias(
            "sum_chord_e7"
        ),
        F.sum("event_a").alias("sum_ea"),
        F.sum("event_b").alias("sum_eb"),
        F.countDistinct("user_a").alias("n_users_a"),
    ).collect()[0]
    return {
        "n_pairs": int(row.n_pairs),
        "sum_dt_us": int(row.sum_dt_us),
        "sum_chord_e7": int(row.sum_chord_e7),
        "sum_ea": int(row.sum_ea),
        "sum_eb": int(row.sum_eb),
        "n_users_a": int(row.n_users_a),
    }


def duck_aggs(sf_dir: str):
    import duckdb

    from rust_s2_spark.engine.oracles import oracle_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    sql = oracle_sql()["s2_colocation_join"]
    row = con.sql(
        f"SELECT count(*), CAST(sum(dt_us) AS HUGEINT), "
        f"CAST(sum(CAST(round(chord2_r * 1e7, 0) AS BIGINT)) AS HUGEINT), "
        f"sum(event_a), sum(event_b), count(DISTINCT user_a) FROM ({sql}) t"
    ).fetchall()[0]
    return {
        "n_pairs": int(row[0]),
        "sum_dt_us": int(row[1]),
        "sum_chord_e7": int(row[2]),
        "sum_ea": int(row[3]),
        "sum_eb": int(row[4]),
        "n_users_a": int(row[5]),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft/sf1"
    t0 = time.time()
    got = spark_aggs(sf_dir)
    t_spark = round(time.time() - t0, 1)
    print("spark:", got, f"({t_spark}s)", flush=True)
    t0 = time.time()
    want = duck_aggs(sf_dir)
    t_duck = round(time.time() - t0, 1)
    print("duckdb:", want, f"({t_duck}s)", flush=True)
    ok = got == want
    print("MATCH" if ok else "MISMATCH")
    if ok:
        json.dump(
            {
                "what": (
                    "sf1 gate for s2_colocation_join: the full row set is too "
                    "large to collect for the standard hash gate, so both "
                    "engines are compared on exact order-independent integer "
                    "aggregates (count, HUGEINT sum of dt_us, scaled-integer "
                    "chord checksum, membership id sums, distinct users) — "
                    "the same evidence standard as the offline cluster gate."
                ),
                "sf_dir": sf_dir,
                "aggregates": got,
                "spark_sec": t_spark,
                "duckdb_sec": t_duck,
                "summary": "1 pass, 0 fail",
            },
            open("CORRECTNESS_sf1_coloc.json", "w"),
            indent=1,
        )
        print("wrote CORRECTNESS_sf1_coloc.json")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
