"""s2_colocation_join + s2_od_matrix vs numpy/pandas brute-force replays."""

from __future__ import annotations

import duckdb
import numpy as np

from rust_s2_spark.engine import specs

SF = "/root/testdata/sf0.001"


def _events():
    ev = duckdb.sql(
        f"SELECT event_id, user_id, epoch_us(ts) FROM '{SF}/events.parquet' "
        "ORDER BY event_id"
    ).fetchall()
    ids = np.array([e[0] for e in ev], dtype=np.int64)
    users = np.array([e[1] for e in ev], dtype=np.int64)
    us = np.array([e[2] for e in ev], dtype=np.int64)
    lat, lng = specs.latlng_np(ids)
    la, ln = np.radians(lat), np.radians(lng)
    x, y, z = np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)
    return ids, users, us, x, y, z


def test_colocation_matches_bruteforce(spark):
    """All-pairs numpy brute force: different users, chord <= COLOC_RADIUS,
    |dt| <= COLOC_WINDOW_US — row set and exact values."""
    import math

    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    rows = QUERIES["s2_colocation_join"](spark, SF).collect()
    got = {
        (r.event_a, r.event_b): (r.user_a, r.user_b, r.chord2_r, r.dt_us)
        for r in rows
    }
    assert len(got) == len(rows)  # each unordered pair exactly once

    ids, users, us, x, y, z = _events()
    chord = 2.0 * math.sin(specs.COLOC_RADIUS / 2.0)
    r2 = chord * chord
    want = {}
    n = len(ids)
    for i in range(n):
        dx, dy, dz = x - x[i], y - y[i], z - z[i]
        c2 = dx * dx + dy * dy + dz * dz
        for j in np.nonzero((c2 <= r2) & (ids > ids[i]))[0]:
            if users[i] == users[j]:
                continue
            dt = abs(int(us[i]) - int(us[j]))
            if dt > specs.COLOC_WINDOW_US:
                continue
            want[(int(ids[i]), int(ids[j]))] = (
                int(users[i]),
                int(users[j]),
                round(float(c2[j]), 7),
                dt,
            )
    assert got == want
    assert len(got) > 0
    clear_geo_cache()


def test_od_matrix_matches_pandas(spark):
    """OD flows replayed with the kernel Hilbert encode + pandas groupby."""
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache
    from rust_s2_spark.kernel import hilbert as h
    from rust_s2_spark.kernel import hierarchy as hh

    rows = QUERIES["s2_od_matrix"](spark, SF).collect()
    got = {
        (r.o_tile, r.d_tile): (r.n_steps, r.n_users, r.moved) for r in rows
    }

    ev = duckdb.sql(
        f"SELECT event_id, user_id FROM '{SF}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    ids = np.array([e[0] for e in ev], dtype=np.int64)
    lat, lng = specs.latlng_np(ids)
    leaf = h.cellid_from_latlng(lat, lng)
    tiles = hh.parent(leaf, specs.OD_LEVEL).view(np.int64)
    flows = {}
    for i in range(1, len(ev)):
        if ev[i][1] != ev[i - 1][1]:
            continue
        key = (int(tiles[i - 1]), int(tiles[i]))
        steps, users = flows.setdefault(key, [0, set()])
        flows[key][0] += 1
        flows[key][1].add(ev[i][1])
    want = {
        k: (v[0], len(v[1]), k[0] != k[1]) for k, v in flows.items()
    }
    assert got == want
    # the moved flag is structural; stationary (o == d) flows only appear
    # once tiles repeat (sf0.01+ — at sf0.001 the level-4 grid is sparse)
    assert all(m == (k[0] != k[1]) for k, (_, _, m) in got.items())
    assert any(m for _, _, m in got.values())
    clear_geo_cache()
