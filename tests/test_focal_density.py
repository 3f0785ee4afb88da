"""s2_focal_density (edge-neighbor focal sum on the S2 grid) vs an
independent numpy replay — pins the query's contribution-explode plan to
the kernel adjacency from a third direction (the DuckDB oracle recomputes
the same sums via the FACE_WRAP CASE tables)."""

from __future__ import annotations

from collections import Counter

import duckdb
import numpy as np

from rust_s2_spark.engine import specs
from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert


def _numpy_focal(sf_dir: str, lvl: int):
    ids = (
        duckdb.sql(f"SELECT event_id FROM '{sf_dir}/events.parquet'")
        .fetchnumpy()["event_id"]
        .astype(np.int64)
    )
    lat, lng = specs.latlng_np(ids)
    tiles = h.parent(hilbert.cellid_from_latlng(lat, lng), lvl)
    counts = Counter(np.asarray(tiles, dtype=np.uint64).tolist())
    occupied = np.array(sorted(counts), dtype=np.uint64)
    nbrs = np.asarray(h.edge_neighbors(occupied), dtype=np.uint64)
    focal = {}
    sh = 30 - lvl
    out = {}
    for t, nb in zip(occupied.tolist(), nbrs.tolist()):
        focal[t] = counts[t] + sum(counts.get(x, 0) for x in nb)
    for t in occupied.tolist():
        f, i, j, _ = hilbert.cellid_to_face_ij_orientation(np.uint64(t))
        out[(int(f), int(i) >> sh, int(j) >> sh)] = (counts[t], focal[t])
    return out


def test_focal_density_matches_numpy(spark):
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["s2_focal_density"](spark, sf).collect()
    got = {(r.face, r.ti, r.tj): (r.n, r.focal_n) for r in rows}
    want = _numpy_focal(sf, specs.FOCAL_LEVEL)
    assert got == want
    # the smoothing must actually smooth: some tile's focal exceeds its own
    # count, and cross-face contributions exist (face-border tiles occupied)
    assert any(f > n for n, f in got.values())
    assert len(got) > 1000
    clear_geo_cache()


def test_focal_conservation(spark):
    """Mass conservation: summing focal_n over ALL grid tiles (occupied or
    not) must equal 5x the event count — each event's tile sends its unit
    to itself + 4 neighbors.  Since the query emits occupied tiles only,
    check the equivalent identity on the emitted rows: sum(focal_n)
    counts each event once per OCCUPIED member of {tile} ∪ neighbors."""
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["s2_focal_density"](spark, sf).collect()
    got = {(r.face, r.ti, r.tj): (r.n, r.focal_n) for r in rows}
    want = _numpy_focal(sf, specs.FOCAL_LEVEL)
    assert got == want
    assert sum(n for n, _ in got.values()) == 1000  # every event tiled once
    clear_geo_cache()
