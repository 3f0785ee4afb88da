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


def _ordered_events(sf):
    ev = duckdb.sql(
        f"SELECT event_id, user_id, ts FROM '{sf}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    ids = np.array([e[0] for e in ev], dtype=np.int64)
    lat, lng = specs.latlng_np(ids)
    la, ln = np.radians(lat), np.radians(lng)
    x, y, z = np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)
    return ev, lat, lng, x, y, z


def test_trajectory_stats_match_numpy(spark):
    """s2_trajectory_stats vs a per-user numpy replay: integer-exact chord
    totals (scaled-bigint per-step rounding BEFORE the sum), bbox, first/
    last displacement, straightness."""
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.001"
    rows = {r.user_id: r for r in QUERIES["s2_trajectory_stats"](spark, sf).collect()}

    ev, lat, lng, x, y, z = _ordered_events(sf)
    users = {}
    for i, e in enumerate(ev):
        users.setdefault(e[1], []).append(i)
    assert set(rows) == set(users)
    for uid, idx in users.items():
        r = rows[uid]
        assert r.n_events == len(idx)
        assert r.n_steps == len(idx) - 1
        steps = []
        for a, b in zip(idx, idx[1:]):
            c = np.sqrt((x[b] - x[a]) ** 2 + (y[b] - y[a]) ** 2 + (z[b] - z[a]) ** 2)
            steps.append(int(round(float(c) * 1e7)))
        assert r.total_chord_e7 == sum(steps)
        assert r.max_step_e7 == (max(steps) if steps else None)
        assert r.lat_min == float(np.min(lat[idx])) and r.lat_max == float(np.max(lat[idx]))
        assert r.lng_min == float(np.min(lng[idx])) and r.lng_max == float(np.max(lng[idx]))
        f, l = idx[0], idx[-1]
        d = np.sqrt((x[l] - x[f]) ** 2 + (y[l] - y[f]) ** 2 + (z[l] - z[f]) ** 2)
        disp = int(round(float(d) * 1e7))
        assert r.disp_e7 == disp
        if sum(steps) > 0:
            assert r.straightness_r == round(disp / sum(steps), 6)
            assert r.straightness_r <= 1.0  # triangle inequality on the sphere chords
        else:
            assert r.straightness_r is None
    clear_geo_cache()


def test_bearing_match_numpy(spark):
    """s2_bearing vs the numpy great-circle initial-bearing formula; turn
    angles recomputed FROM THE ROUNDED bearings exactly as both engines do."""
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.001"
    rows = {
        (r.user_id, r.event_id): r for r in QUERIES["s2_bearing"](spark, sf).collect()
    }

    ev, lat, lng, x, y, z = _ordered_events(sf)
    la, ln = np.radians(lat), np.radians(lng)
    want = {}
    prev_bearing = {}
    for i in range(len(ev)):
        if i == 0 or ev[i][1] != ev[i - 1][1]:
            continue
        uid = ev[i][1]
        p1, l1, p2, l2 = la[i - 1], ln[i - 1], la[i], ln[i]
        dl = l2 - l1
        yc = np.sin(dl) * np.cos(p2)
        xc = np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl)
        b = round(float((np.degrees(np.arctan2(yc, xc)) + 360.0) % 360.0), 6)
        pb = prev_bearing.get(uid)
        if pb is None:
            turn, cls = None, "first"
        else:
            turn = round(((b - pb + 540.0) % 360.0) - 180.0, 6)
            cls = "right" if turn > 15.0 else ("left" if turn < -15.0 else "straight")
        want[(uid, ev[i][0])] = (ev[i - 1][0], b, turn, cls)
        prev_bearing[uid] = b
    got = {
        k: (r.prev_event, r.bearing_r, r.turn_r, r.turn_class) for k, r in rows.items()
    }
    assert got == want
    # bearings live in [0, 360); turns in (-180, 180]
    assert all(0.0 <= r.bearing_r < 360.0 for r in rows.values())
    assert all(
        r.turn_r is None or -180.0 < r.turn_r <= 180.0 for r in rows.values()
    )
    clear_geo_cache()
