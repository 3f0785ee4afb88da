"""Deterministic scale-up of the driver testdata for the sf1 spot-gate.

The driver ships sf <= 0.1; broadcast/SMJ thresholds and AQE decisions
genuinely change an order of magnitude up, so the plan-sensitive queries
get a local sf1 gate.  Fact tables are replicated MULT times with id
remapping (new ids -> new derived lat/lng via the LCG, i.e. genuinely new
geometry, not 10 stacked copies of the same points); dimension tables are
copied through.  Pure DuckDB, no randomness — rerunning produces the
identical dataset.

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [mult]
Defaults: /root/testdata/sf0.1 -> /tmp/spark_graft/sf1, mult=10.
"""

from __future__ import annotations

import os
import sys

import duckdb

DIMS = ["region", "nation"]
# (table, id columns to remap).  Key offsets use (max(id)+1) per table so
# replica keyspaces never collide; orderkey is remapped consistently in
# orders AND lineitem so the join structure is preserved.
FACTS = {
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}


def generate(src: str, dst: str, mult: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # one shared orderkey stride so orders/lineitem stay joinable
    strides = {}
    for t, ids in FACTS.items():
        for c in ids:
            if c not in strides:
                strides[c] = con.execute(
                    f"SELECT max({c}) + 1 FROM '{src}/{t}.parquet'"
                ).fetchone()[0]
    strides["l_orderkey"] = strides["o_orderkey"]
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, ids in FACTS.items():
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.c * {strides[c]} AS {c}" if c in ids else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', range({mult}) r(c)) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in DIMS + list(FACTS):
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft/sf1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, dst, mult)
