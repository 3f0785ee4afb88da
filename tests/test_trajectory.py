"""s2_trajectory_step (per-user consecutive-step chord distances) vs a
numpy replay — order (ts, event_id), per-step emission, 7-dp rounding."""

from __future__ import annotations

import duckdb
import numpy as np

from rust_s2_spark.engine import specs


def test_trajectory_steps_match_numpy(spark):
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["s2_trajectory_step"](spark, sf).collect()
    got = {
        (r.user_id, r.event_id): (r.prev_event, r.chord2_r) for r in rows
    }

    ev = duckdb.sql(
        f"SELECT event_id, user_id, ts FROM '{sf}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    ids = np.array([e[0] for e in ev], dtype=np.int64)
    lat, lng = specs.latlng_np(ids)
    la, ln = np.radians(lat), np.radians(lng)
    x, y, z = np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)
    want = {}
    for i in range(1, len(ev)):
        if ev[i][1] != ev[i - 1][1]:
            continue
        c2 = (
            (x[i] - x[i - 1]) * (x[i] - x[i - 1])
            + (y[i] - y[i - 1]) * (y[i] - y[i - 1])
            + (z[i] - z[i - 1]) * (z[i] - z[i - 1])
        )
        want[(ev[i][1], ev[i][0])] = (ev[i - 1][0], round(float(c2), 7))
    assert got == want
    # every user with >= 2 events contributes steps; none crosses users
    n_users = len({e[1] for e in ev})
    assert len(got) == len(ev) - n_users
    clear_geo_cache()
