"""Polyline chain API + Region/coverer compatibility (kernel/polyline.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.engine import specs
from rust_s2_spark.kernel import hilbert
from rust_s2_spark.kernel.covering import RegionCoverer
from rust_s2_spark.kernel.polyline import Polyline
from rust_s2_spark.kernel.region import _latlng_point


@pytest.fixture
def pl():
    return Polyline.from_latlngs(specs.POLYLINE)


def test_length_and_interpolate(pl):
    total = pl.length()
    assert total > 0
    # endpoints exact
    assert np.allclose(pl.interpolate(0.0), pl.vertices[0])
    assert np.allclose(pl.interpolate(1.0), pl.vertices[-1])
    # interpolated points lie ON the chain (distance ~0) and are monotone
    # along it by arc length
    prev = 0.0
    for t in np.linspace(0.05, 0.95, 10):
        p = pl.interpolate(float(t))
        assert pl.distance_rad(p) < 1e-12
        # prefix length up to the projection grows with t
        q, k = pl.project(p)
        lens = pl._edge_lengths()
        a = pl.vertices[k]
        seg = math.atan2(float(np.linalg.norm(np.cross(a, q))), float(a @ q))
        prefix = float(lens[:k].sum()) + seg
        assert prefix >= prev - 1e-12
        prev = prefix
    # halfway point splits the length in half
    mid = pl.interpolate(0.5)
    q, k = pl.project(mid)
    lens = pl._edge_lengths()
    a = pl.vertices[k]
    seg = math.atan2(float(np.linalg.norm(np.cross(a, mid))), float(a @ mid))
    assert abs((float(lens[:k].sum()) + seg) - 0.5 * pl.length()) < 1e-9


def test_project_and_distance(pl):
    p = _latlng_point(math.radians(37), math.radians(-100))
    q, k = pl.project(p)
    assert 0 <= k < pl.num_edges()
    # the projected point is on the chain and realizes the distance
    d_direct = math.atan2(float(np.linalg.norm(np.cross(p, q))), float(p @ q))
    assert abs(d_direct - pl.distance_rad(p)) < 1e-9
    # vertices project to themselves
    for v in pl.vertices:
        assert pl.distance_rad(v) < 1e-12


def test_coverer_compatibility(pl):
    cu = RegionCoverer(max_cells=16, max_level=10).covering(pl)
    assert 1 <= len(cu.ids) <= 16
    for t in np.linspace(0, 1, 100):
        pt = pl.interpolate(float(t))
        lat = math.degrees(math.asin(pt[2]))
        lng = math.degrees(math.atan2(pt[1], pt[0]))
        assert cu.contains_cellid(int(hilbert.cellid_from_latlng(lat, lng)))


def test_simplify_wiggles():
    lats = [0, 0.001, 0, -0.001, 0, 10]
    lngs = [0, 1, 2, 3, 4, 10]
    pl = Polyline.from_latlngs(list(zip(lats, lngs)))
    s = pl.simplify(math.radians(0.1))
    assert s.num_edges() < pl.num_edges()
    assert np.allclose(s.vertices[0], pl.vertices[0])
    assert np.allclose(s.vertices[-1], pl.vertices[-1])


def test_rejects_degenerate():
    with pytest.raises(ValueError):
        Polyline(np.array([[1.0, 0.0, 0.0]]))
