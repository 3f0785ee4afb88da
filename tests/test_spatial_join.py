"""Spatial join vs brute-force numpy oracle (BASELINE.md join-output-row equality).

The engine's covering-prefilter + refine must produce exactly the rows a
brute-force all-pairs evaluation produces on the same inputs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_s2_spark.engine import ingest, join, tiling
from rust_s2_spark.engine.ingest import doc_latlng
from rust_s2_spark.kernel.region import Cap, Rect
from rust_s2_spark.kernel.stuv import latlng_to_xyz

pytestmark = pytest.mark.spark

N_DOCS = 3000

CAPS = [
    join.CapSpec("sf", 37.7749, -122.4194, 1.5),
    join.CapSpec("nyc", 40.7128, -74.0060, 0.8),
    join.CapSpec("tokyo_wide", 35.6762, 139.6503, 5.0),
    join.CapSpec("southern", -75.0, 0.0, 10.0),
]

RECTS = [
    join.RectSpec("bay", 37.0, -123.2, 38.6, -121.2),
    join.RectSpec("dateline", -10.0, 170.0, 10.0, -170.0),  # crosses ±180
    join.RectSpec("europe", 45.0, 5.0, 55.0, 15.0),
]


def _brute_force_cap(spec: join.CapSpec):
    idx = np.arange(N_DOCS)
    lat, lng = doc_latlng(idx)
    cap = Cap.from_latlng_radius(spec.lat, spec.lng, spec.radius_deg)
    x, y, z = latlng_to_xyz(lat, lng)
    d2 = (x - cap.center[0]) ** 2 + (y - cap.center[1]) ** 2 + (z - cap.center[2]) ** 2
    hit = np.minimum(d2, 4.0) <= cap.radius2
    return {f"doc-{i:012d}" for i in idx[hit]}


def _brute_force_rect(spec: join.RectSpec):
    idx = np.arange(N_DOCS)
    lat, lng = doc_latlng(idx)
    rect = Rect.from_degrees(spec.lat_lo, spec.lng_lo, spec.lat_hi, spec.lng_hi)
    hit = np.array(
        [
            rect.contains_latlng_rad(np.radians(lat[i]), np.radians(lng[i]))
            for i in range(N_DOCS)
        ]
    )
    return {f"doc-{i:012d}" for i in idx[hit]}


@pytest.fixture(scope="module")
def docs_tiled(spark):
    docs = ingest.synth_docs(spark, N_DOCS, partitions=8)
    return tiling.with_leaf_cellid(ingest.extract_geo(docs)).cache()


def test_cap_join_matches_brute_force(spark, docs_tiled):
    regions, coverings = join.cap_regions_df(spark, CAPS)
    out = join.cap_join(docs_tiled, regions, coverings)
    got = {(r["region_id"], r["doc_id"]) for r in out.collect()}
    want = set()
    for spec in CAPS:
        for d in _brute_force_cap(spec):
            want.add((spec.region_id, d))
    assert got == want
    assert len(want) > 50  # sanity: the fixture actually exercises hits


def test_cap_join_salted_identical(spark, docs_tiled):
    regions, coverings = join.cap_regions_df(spark, CAPS)
    plain = join.cap_join(docs_tiled, regions, coverings)
    salted = join.cap_join(
        docs_tiled, regions, coverings, broadcast_regions=False, salt=4
    )
    a = {(r["region_id"], r["doc_id"]) for r in plain.collect()}
    b = {(r["region_id"], r["doc_id"]) for r in salted.collect()}
    assert a == b


def test_rect_join_matches_brute_force(spark, docs_tiled):
    regions, coverings = join.rect_regions_df(spark, RECTS)
    out = join.rect_join(docs_tiled, regions, coverings)
    got = {(r["region_id"], r["doc_id"]) for r in out.collect()}
    want = set()
    for spec in RECTS:
        for d in _brute_force_rect(spec):
            want.add((spec.region_id, d))
    assert got == want
    # the dateline rect must actually have matches on both sides of ±180
    dl = [d for (r, d) in got if r == "dateline"]
    assert len(dl) > 0


def test_range_join_matches_equi_join(spark, docs_tiled):
    """The range-form join (range_min <= leaf <= range_max) and the
    per-level ancestor equi-join are the same relation."""
    _, coverings = join.cap_regions_df(spark, CAPS)
    equi = join.covering_join(docs_tiled, coverings)
    rng = join.covering_range_join(docs_tiled, coverings)
    a = {(r["region_id"], r["doc_id"], r["cover_cell"]) for r in equi.collect()}
    b = {(r["region_id"], r["doc_id"], r["cover_cell"]) for r in rng.collect()}
    assert a == b
    assert len(a) > 0


def test_knn_cellring_1000_queries(spark, docs_tiled):
    """Cell-ring kNN at 10^3 simultaneous query points: exact vs numpy brute
    force, with the whole batch converging in O(log r / rounds_per_job)
    driver jobs (no per-query serialization — VERDICT r2 item 5)."""
    from rust_s2_spark.engine.knn import knn_cellring

    k = 3
    n_q = 1000
    rng = np.random.default_rng(20260817)
    qlat = rng.uniform(-80.0, 80.0, n_q)
    qlng = rng.uniform(-180.0, 180.0, n_q)
    qx, qy, qz = latlng_to_xyz(qlat, qlng)
    queries = [
        (f"q{i:04d}", float(qx[i]), float(qy[i]), float(qz[i])) for i in range(n_q)
    ]

    idx = np.arange(N_DOCS)
    lat, lng = doc_latlng(idx)
    dx, dy, dz = latlng_to_xyz(lat, lng)
    d2 = (
        (dx[None, :] - qx[:, None]) ** 2
        + (dy[None, :] - qy[:, None]) ** 2
        + (dz[None, :] - qz[:, None]) ** 2
    )
    # expected top-k with the engine's tie-break (d2 asc, doc_id asc);
    # doc ids are zero-padded so lexicographic == numeric order
    expect = {}
    for i in range(n_q):
        order = np.lexsort((idx, d2[i]))[:k]
        expect[f"q{i:04d}"] = [
            (f"doc-{j:012d}", d2[i, j]) for j in order
        ]

    # start coarse so several radius-doubling rounds actually exercise the
    # phase batching
    out = knn_cellring(
        spark, docs_tiled, queries, k, init_radius_deg=2.0, id_col="doc_id",
        max_rounds=12, rounds_per_job=3,
    )
    rows = out.collect()
    assert len(rows) == n_q * k
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["d2"]))
    for qid, exp in expect.items():
        g = sorted(got[qid])
        assert [x[1] for x in g] == [e[0] for e in exp], qid
        for (_, _, gd2), (_, ed2) in zip(g, exp):
            # Spark computes d2 from lat/lng via its own cos/sin; last-ulp
            # differences vs numpy are expected (d2 <= 4, so 1e-9 is ~1e-10
            # relative)
            assert abs(gd2 - ed2) < 1e-9
