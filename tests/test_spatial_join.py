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
