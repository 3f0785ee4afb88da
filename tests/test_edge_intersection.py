"""Robust edge-intersection oracles — the angular-slope property harness of
edge_crossings.rs:640-818: random edge pairs crossing at angles down to
1e-12 rad; the computed intersection must lie within INTERSECTION_ERROR of
both edges and of the exact-arithmetic intersection."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernel.edgeutil import distance_from_segment
from rust_s2_spark.kernel.pip import (
    INTERSECTION_ERROR,
    EdgeCrosser,
    edge_intersection,
    intersection_exact,
)

DBL_EPSILON = 2.220446049250313e-16


def n(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _frame(rng):
    z = n(rng.normal(size=3))
    x = n(np.cross(z, rng.normal(size=3)))
    y = np.cross(z, x)
    return x, y, z


def _ang(p, q):
    return math.atan2(np.linalg.norm(np.cross(p, q)), float(p @ q))


def _exact_circle_dist(x, e0, e1):
    """|x . (e0 x e1)| / |e0 x e1| with the dot product in exact arithmetic."""
    from fractions import Fraction

    f0 = [Fraction(float(v)) for v in e0]
    f1 = [Fraction(float(v)) for v in e1]
    nrm = (
        f0[1] * f1[2] - f0[2] * f1[1],
        f0[2] * f1[0] - f0[0] * f1[2],
        f0[0] * f1[1] - f0[1] * f1[0],
    )
    fx = [Fraction(float(v)) for v in x]
    dot = sum(a * b for a, b in zip(fx, nrm))
    nn = math.sqrt(float(sum(v * v for v in nrm)))
    return abs(float(dot)) / nn


def test_exact_simple_cases():
    a0, a1 = n([1, 0, 0]), n([0, 1, 0])
    b0, b1 = n([1, 1, 1]), n([1, 1, -1])
    want = n([1, 1, 0])
    got = edge_intersection(a0, a1, b0, b1)
    assert _ang(got, want) < INTERSECTION_ERROR
    # invariance under swaps/reversals (edge_crossings.rs:150-155)
    for args in [(a1, a0, b1, b0), (b0, b1, a0, a1), (b1, b0, a1, a0)]:
        assert _ang(edge_intersection(*args), got) < INTERSECTION_ERROR


@pytest.mark.parametrize("slope_exp", range(2, 13, 2))
def test_intersection_at_shallow_angles(slope_exp):
    slope = 10.0 ** (-slope_exp)
    rng = np.random.default_rng(slope_exp)
    for _ in range(30):
        x, y, z = _frame(rng)
        p = z
        d1 = n(x + slope * y)
        d2 = n(x - slope * y)
        # find a crossing pair (edge_crossings.rs:668-703)
        ab_len = cd_len = None
        for _tries in range(200):
            ab_len = math.pi * 10.0 ** rng.uniform(-4, -0.3)
            cd_len = math.pi * 10.0 ** rng.uniform(-4, -0.3)
            a_fr = rng.uniform()
            c_fr = rng.uniform()
            # near-endpoint stress: put A (resp. C) an ABSOLUTE 1-1e4 ulps
            # from the crossing point.  a_fr is a FRACTION of ab_len, so
            # divide by the edge length (the old `* ab_len` form scaled by
            # the length twice, and the offset rounded to zero — the case
            # silently degenerated to a shared vertex and was retried).
            if rng.uniform() < 0.25:
                a_fr = min(0.5, DBL_EPSILON * 10.0 ** rng.uniform(0, 4) / ab_len)
            if rng.uniform() < 0.25:
                c_fr = min(0.5, DBL_EPSILON * 10.0 ** rng.uniform(0, 4) / cd_len)
            a = n(p - d1 * (a_fr * ab_len))
            b = n(p + d1 * ((1 - a_fr) * ab_len))
            c = n(p - d2 * (c_fr * cd_len))
            d = n(p + d2 * ((1 - c_fr) * cd_len))
            if EdgeCrosser(a, b).crossing_sign(c, d) > 0:
                break
        else:
            continue
        expected = intersection_exact(a, b, c, d)
        if float(expected @ (a + b + c + d)) < 0:
            expected = -expected
        actual = edge_intersection(a, b, c, d)
        # distance to each edge's great circle, measured EXACTLY (Fraction):
        # the chord-based segment-distance formula has O(100 eps) measurement
        # error at eps-scale distances on short edges, so it cannot certify
        # an 8-eps bound; the exact measurement can.
        for e0, e1 in ((a, b), (c, d)):
            assert _exact_circle_dist(actual, e0, e1) <= INTERSECTION_ERROR
        # segment (not just circle) proximity, with the measurement envelope
        assert distance_from_segment(actual, a, b)[0] <= 1e-12
        assert distance_from_segment(actual, c, d)[0] <= 1e-12
        # and within intersectionError of the exact intersection point
        assert _ang(actual, expected) <= INTERSECTION_ERROR


def test_collinear_edges_pick_interior_endpoint():
    # overlapping collinear edges: exact path returns the lexicographically
    # smallest endpoint interior to the other edge (edge_crossings.rs:373-392)
    a0 = n([1, 0.0, 0])
    a1 = n([1, 0.3, 0])
    b0 = n([1, 0.1, 0])
    b1 = n([1, 0.4, 0])
    got = intersection_exact(a0, a1, b0, b1)
    # interior endpoints are a1 (inside b) and b0 (inside a)
    cands = sorted([tuple(a1), tuple(b0)])
    assert tuple(got) == cands[0]
