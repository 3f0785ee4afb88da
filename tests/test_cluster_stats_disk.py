"""s2_cluster_stats and s2_cell_disk vs independent driver-side replays.

cluster_stats: a pandas groupby over the (separately gated) DBSCAN labels
must reproduce every aggregate BIT-exactly — the bbox min/max are over the
derived lat/lng degrees, which specs.latlng_sql's double-chain cast makes
identical across Spark / numpy / DuckDB.

cell_disk: a numpy BFS with kernel edge_neighbors (set-based, order-free)
must reproduce the distributed kRing rows exactly, including the FACE_WRAP
crossings and count-0 ring cells.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from rust_s2_spark.engine import specs
from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert

SF = "/root/testdata/sf0.01"


def test_cluster_stats_matches_pandas_replay(spark):
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    lab = QUERIES["s2_dbscan"](spark, SF).toPandas()
    members = lab[lab.cluster_id >= 0].copy()
    assert len(members) > 100, "fixture must have real clusters"
    lat, lng = specs.latlng_np(members.event_id.to_numpy(np.int64))
    members["lat"], members["lng"] = lat, lng
    members["is_core"] = (members.role == "core").astype(np.int64)
    exp = (
        members.groupby("cluster_id")
        .agg(
            n_points=("event_id", "size"),
            n_core=("is_core", "sum"),
            rep_id=("event_id", "min"),
            lat_lo=("lat", "min"),
            lat_hi=("lat", "max"),
            lng_lo=("lng", "min"),
            lng_hi=("lng", "max"),
        )
        .reset_index()
    )
    got = (
        QUERIES["s2_cluster_stats"](spark, SF)
        .toPandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    exp = exp.sort_values("cluster_id").reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["cluster_id", "n_points", "n_core", "rep_id"]:
        assert (got[c].to_numpy(np.int64) == exp[c].to_numpy(np.int64)).all(), c
    for c in ["lat_lo", "lat_hi", "lng_lo", "lng_hi"]:
        # bit-exact: same doubles, order-independent min/max
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # sanity: clusters are spatially tight (eps ~0.8 deg; diameter bounded
    # by the component's hop count, generously < 90 deg at gate density)
    assert ((got.lat_hi - got.lat_lo) < 90.0).all()
    assert (got.n_core >= 1).all()
    clear_geo_cache()


def _numpy_disk(sf_dir: str, lvl: int, k: int):
    ids = (
        duckdb.sql(f"SELECT event_id FROM '{sf_dir}/events.parquet'")
        .fetchnumpy()["event_id"]
        .astype(np.int64)
    )
    lat, lng = specs.latlng_np(ids)
    tiles = np.asarray(h.parent(hilbert.cellid_from_latlng(lat, lng), lvl))
    uniq, cnt = np.unique(tiles, return_counts=True)
    counts = dict(zip(uniq.tolist(), cnt.tolist()))
    sh = 30 - lvl
    # seeds: per face max count, ties (ti, tj) ascending
    seeds = {}
    for t, n in counts.items():
        f, i, j, _ = hilbert.cellid_to_face_ij_orientation(np.uint64(t))
        key = (int(f),)
        cand = (-n, int(i) >> sh, int(j) >> sh, t)
        if key not in seeds or cand < seeds[key]:
            seeds[key] = cand
    out = {}
    for (face,), (_, _, _, seed) in seeds.items():
        ring = {seed: 0}
        frontier = [seed]
        for r in range(1, k + 1):
            nxt = []
            nbrs = np.asarray(
                h.edge_neighbors(np.array(frontier, dtype=np.uint64))
            ).reshape(-1)
            for nb in nbrs.tolist():
                if nb not in ring:
                    ring[nb] = r
                    nxt.append(nb)
            frontier = nxt
        for t, r in ring.items():
            f, i, j, _ = hilbert.cellid_to_face_ij_orientation(np.uint64(t))
            out[(face, int(f), int(i) >> sh, int(j) >> sh)] = (
                r,
                counts.get(t, 0),
            )
    return out


def test_cell_disk_matches_numpy_bfs(spark):
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["s2_cell_disk"](spark, sf).collect()
    got = {(r.seed_face, r.face, r.ti, r.tj): (r.ring, r.n) for r in rows}
    want = _numpy_disk(sf, specs.DISK_LEVEL, specs.DISK_K)
    assert got == want
    # structural: one ring-0 cell per seed, and it is occupied
    ring0 = [(k, v) for k, v in got.items() if v[0] == 0]
    seed_faces = {k[0] for k in got}
    assert len(ring0) == len(seed_faces)
    assert all(v[1] > 0 for _, v in ring0)
    # the disk must contain unoccupied cells (it is a GRID neighborhood)
    assert any(v[1] == 0 for v in got.values())
    # every ring count is within [0, DISK_K]
    assert all(0 <= v[0] <= specs.DISK_K for v in got.values())
    clear_geo_cache()


def test_latlng_sql_double_chain_matches_numpy(spark):
    """The specs.latlng_sql cast contract: Spark evaluates the identical
    IEEE double op sequence as latlng_np (and DuckDB) — bit-for-bit, and
    the column type is DOUBLE, not DECIMAL."""
    from pyspark.sql import functions as F

    lat_sql, lng_sql = specs.latlng_sql("event_id")
    sdf = (
        spark.range(20000)
        .withColumnRenamed("id", "event_id")
        .select(
            "event_id", F.expr(lat_sql).alias("lat"), F.expr(lng_sql).alias("lng")
        )
    )
    assert dict(sdf.dtypes)["lat"] == "double"
    assert dict(sdf.dtypes)["lng"] == "double"
    pdf = sdf.toPandas().sort_values("event_id")
    lat, lng = specs.latlng_np(pdf.event_id.to_numpy(np.int64))
    assert (pdf.lat.to_numpy() == lat).all()
    assert (pdf.lng.to_numpy() == lng).all()
