"""Hypothesis property tests for the numpy kernels (SURVEY §5 model:
the reference leans on randomized property harnesses; these are the
pure-kernel invariants that must hold for every input).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert, stuv

lat_st = st.floats(min_value=-89.999999, max_value=89.999999)
lng_st = st.floats(min_value=-179.999999, max_value=179.999999)
level_st = st.integers(min_value=0, max_value=30)


@settings(max_examples=300, deadline=None)
@given(lat_st, lng_st)
def test_encode_decode_roundtrip(lat, lng):
    """latlng -> leaf cellid -> center latlng stays within half a leaf cell
    (~1e-7 deg), and decode(encode) reproduces exact face/i/j."""
    cid = hilbert.cellid_from_latlng(lat, lng)
    assert h.is_valid(cid)
    assert h.level(cid) == 30
    f, i, j, _ = hilbert.cellid_to_face_ij_orientation(cid)
    cid2 = hilbert.cellid_from_face_ij(f, i, j)
    assert int(cid2) == int(cid)
    clat, clng = hilbert.cellid_to_latlng(cid)
    # chord distance to the cell center (precise near zero, unlike acos)
    # must be below the max leaf-cell diagonal (~2.5e-9 rad)
    def xyz(la, lo):
        la, lo = math.radians(la), math.radians(lo)
        return np.array(
            [math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la)]
        )

    d = float(np.linalg.norm(xyz(lat, lng) - xyz(float(clat), float(clng))))
    assert d < 3e-9


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, level_st)
def test_parent_range_invariants(lat, lng, level):
    leaf = hilbert.cellid_from_latlng(lat, lng)
    p = h.parent(leaf, level)
    assert h.level(p) == level
    assert int(h.range_min(p)) <= int(leaf) <= int(h.range_max(p))
    # a cell contains itself, its parent contains it
    assert h.contains(p, leaf)
    if level > 0:
        gp = h.parent(leaf, level - 1)
        assert h.contains(gp, p)
        assert h.immediate_parent(p) == gp


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, st.integers(min_value=0, max_value=29))
def test_children_partition(lat, lng, level):
    cell = h.parent(hilbert.cellid_from_latlng(lat, lng), level)
    kids = h.children(cell)
    assert len(kids) == 4
    # children tile the parent's leaf range exactly, in order
    assert int(h.range_min(kids[0])) == int(h.range_min(cell))
    assert int(h.range_max(kids[3])) == int(h.range_max(cell))
    for a, b in zip(kids, kids[1:]):
        # range endpoints are LEAF ids (odd); adjacent leaves differ by 2
        assert int(h.range_max(a)) + 2 == int(h.range_min(b))
    for k in kids:
        assert h.immediate_parent(k) == cell


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, level_st)
def test_token_roundtrip(lat, lng, level):
    cell = h.parent(hilbert.cellid_from_latlng(lat, lng), level)
    tok = h.to_token(cell)
    assert h.from_token(tok) == cell
    assert 1 <= len(tok) <= 16


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st)
def test_st_uv_roundtrips(lat, lng):
    x, y, z = stuv.latlng_to_xyz(lat, lng)
    f, u, v = stuv.xyz_to_face_uv(x, y, z)
    # uv -> st -> uv round trip is exact-ish (quadratic transform)
    s = stuv.uv_to_st(u)
    assert abs(float(stuv.st_to_uv(s)) - float(u)) < 1e-15
    # face_uv_to_xyz inverts the projection up to scale
    x2, y2, z2 = stuv.face_uv_to_xyz(f, u, v)
    n = math.sqrt(float(x2) ** 2 + float(y2) ** 2 + float(z2) ** 2)
    assert abs(float(x2) / n - float(x)) < 1e-14
    assert abs(float(y2) / n - float(y)) < 1e-14
    assert abs(float(z2) / n - float(z)) < 1e-14


@settings(max_examples=100, deadline=None)
@given(lat_st, lng_st, st.floats(min_value=0.1, max_value=20.0))
def test_cap_covering_contains_center(lat, lng, radius_deg):
    from rust_s2_spark.kernel.covering import RegionCoverer
    from rust_s2_spark.kernel.region import Cap

    cap = Cap.from_latlng_radius(lat, lng, radius_deg)
    cu = RegionCoverer(max_cells=8).covering(cap)
    assert cu.ids == sorted(cu.ids, key=lambda c: np.uint64(c))
    leaf = int(hilbert.cellid_from_latlng(lat, lng))
    assert cu.contains_cellid(leaf)  # covering always contains the center
    assert 1 <= len(cu.ids) <= 8
