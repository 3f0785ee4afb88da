"""Spherical Douglas-Peucker simplification (kernel/simplify.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernel import edgeutil
from rust_s2_spark.kernel.pip import Loop, regular_loop
from rust_s2_spark.kernel.region import _latlng_point
from rust_s2_spark.kernel.simplify import simplify_loop, simplify_points


def _max_deviation(original: np.ndarray, simplified: Loop) -> float:
    sv = simplified.vertices
    m = len(sv)
    out = 0.0
    for p in original:
        best = min(
            float(edgeutil.distance_from_segment(p[None, :], sv[k], sv[(k + 1) % m])[0])
            for k in range(m)
        )
        out = max(out, best)
    return out


def test_simplify_loop_tolerance_bound():
    c = _latlng_point(math.radians(40), math.radians(-100))
    big = regular_loop(c, math.radians(8), 512)
    for tol_deg in (0.01, 0.1, 0.5):
        tol = math.radians(tol_deg)
        s = simplify_loop(big, tol)
        assert 3 <= len(s.vertices) < len(big.vertices)
        # retained vertices are a subset of the originals
        orig = {tuple(v) for v in big.vertices}
        assert all(tuple(v) in orig for v in s.vertices)
        # every original vertex within ~2*tol of the simplified boundary
        # (DP guarantees tol against the chain during recursion; the closed
        # ring merge can loosen it slightly)
        assert _max_deviation(big.vertices, s) <= 2 * tol
        # the simplified region is close: area within perimeter*tol
        assert abs(s.area() - big.area()) < 2 * math.pi * tol + 1e-9
        # point classification preserved for deep-interior points
        assert s.contains_point(c)


def test_simplify_monotone_in_tolerance():
    c = _latlng_point(math.radians(0), math.radians(0))
    big = regular_loop(c, math.radians(5), 256)
    sizes = [
        len(simplify_loop(big, math.radians(t)).vertices) for t in (0.01, 0.05, 0.2)
    ]
    assert sizes == sorted(sizes, reverse=True)


def test_simplify_small_loop_passthrough():
    lp = Loop.from_latlng_text("0:0, 0:10, 10:10, 10:0")
    assert simplify_loop(lp, math.radians(1)) is lp


def test_simplify_points_open_polyline():
    # zig-zag with a tiny wiggle: the wiggle vertex drops at loose tolerance
    lats = [0.0, 0.001, 0.0, 5.0, 10.0]
    lngs = [0.0, 2.5, 5.0, 7.5, 10.0]
    pts = np.array(
        [_latlng_point(math.radians(a), math.radians(b)) for a, b in zip(lats, lngs)]
    )
    kept_tight = simplify_points(pts, math.radians(0.0001))
    kept_loose = simplify_points(pts, math.radians(1.0))
    assert len(kept_loose) < len(kept_tight)
    assert kept_loose[0] == 0 and kept_loose[-1] == len(pts) - 1
