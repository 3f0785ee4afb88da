"""s2_geo_sample (deterministic per-tile top-K) vs a numpy replay, plus
the plan property that makes it scale: the row_number cap is rewritten to
a map-side WindowGroupLimit below the exchange (Spark >= 3.5), so the
shuffle moves O(K * tiles) rows, not the corpus."""

from __future__ import annotations

import duckdb
import numpy as np

from rust_s2_spark.engine import specs
from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert


def test_geo_sample_matches_numpy_and_limits_shuffle(spark):
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.01"
    df = QUERIES["s2_geo_sample"](spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the map-side partial top-k must sit below the exchange
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    got = {(r.event_id): (r.tile, r.rk) for r in rows}

    ids = (
        duckdb.sql(f"SELECT event_id FROM '{sf}/events.parquet'")
        .fetchnumpy()["event_id"]
        .astype(np.int64)
    )
    lat, lng = specs.latlng_np(ids)
    tiles = np.asarray(
        h.parent(hilbert.cellid_from_latlng(lat, lng), specs.FOCAL_LEVEL)
    ).view(np.int64)
    ordkey = (ids * specs.LCG_A + specs.LCG_C) % specs.LCG_M
    want = {}
    by_tile: dict = {}
    for e, t, o in zip(ids.tolist(), tiles.tolist(), ordkey.tolist()):
        by_tile.setdefault(t, []).append((o, e))
    for t, members in by_tile.items():
        for rk, (_, e) in enumerate(sorted(members)[: specs.GEO_SAMPLE_K], 1):
            want[e] = (t, rk)
    assert got == want
    # the cap binds somewhere (a tile with > K events exists at this SF)
    assert any(len(m) > specs.GEO_SAMPLE_K for m in by_tile.values())
    clear_geo_cache()
