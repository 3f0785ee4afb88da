"""Edge distance/interpolation oracles ported from edgeutil.rs:342-860,
plus metric boundary cases (metric.rs:177-211)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernel import edgeutil as eu

PI = math.pi
SQRT_2 = math.sqrt(2.0)


def n(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


# (x, a, b, want_dist_rad, want_closest) — edgeutil.rs test_edge_distances_check_distance
CHECK_DISTANCE = [
    ((1, 0, 0), (1, 0, 0), (0, 1, 0), 0.0, (1, 0, 0)),
    ((0, 1, 0), (1, 0, 0), (0, 1, 0), 0.0, (0, 1, 0)),
    ((1, 3, 0), (1, 0, 0), (0, 1, 0), 0.0, (1, 3, 0)),
    ((0, 0, 1), (1, 0, 0), (0, 1, 0), PI / 2, (1, 0, 0)),
    ((0, 0, -1), (1, 0, 0), (0, 1, 0), PI / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (0, 1, 0), 0.75 * PI, (1, 0, 0)),
    ((0, 1, 0), (1, 0, 0), (1, 1, 0), PI / 4, (1, 1, 0)),
    ((0, -1, 0), (1, 0, 0), (1, 1, 0), PI / 2, (1, 0, 0)),
    ((0, -1, 0), (1, 0, 0), (-1, 1, 0), PI / 2, (1, 0, 0)),
    ((-1, -1, 0), (1, 0, 0), (-1, 1, 0), PI / 2, (-1, 1, 0)),
    ((1, 1, 1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3.0)), (1, 1, 0)),
    ((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3.0)), (1, 1, 0)),
    ((-1, 0, 0), (1, 1, 0), (1, 1, 0), 0.75 * PI, (1, 1, 0)),
    ((0, 0, -1), (1, 1, 0), (1, 1, 0), PI / 2, (1, 1, 0)),
    ((-1, 0, 0), (1, 0, 0), (1, 0, 0), PI, (1, 0, 0)),
]


@pytest.mark.parametrize("x,a,b,want,closest", CHECK_DISTANCE)
def test_distance_from_segment(x, a, b, want, closest):
    d = eu.distance_from_segment(n(x), n(a), n(b))[0]
    assert abs(d - want) < 1e-14, (d, want)


@pytest.mark.parametrize("x,a,b,want,closest", CHECK_DISTANCE)
def test_project_closest(x, a, b, want, closest):
    got = eu.project(n(x), n(a), n(b))[0]
    assert np.allclose(got, n(closest), atol=1e-14), (got, n(closest))


# edgeutil.rs test_edge_distances_check_max_distance
CHECK_MAX = [
    ((1, 0, 1), (1, 0, 0), (0, 1, 0), PI / 2),
    ((1, 0, -1), (1, 0, 0), (0, 1, 0), PI / 2),
    ((0, 1, 1), (1, 0, 0), (0, 1, 0), PI / 2),
    ((0, 1, -1), (1, 0, 0), (0, 1, 0), PI / 2),
    ((1, 1, 1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(2.0 / 3.0))),
    ((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(2.0 / 3.0))),
    ((1, 0, 0), (1, 1, 0), (1, -1, 0), PI / 4),
    ((0, 1, 0), (1, 1, 0), (1, 1, 0), PI / 4),
    ((0, 0, 1), (0, 1, 1), (0, -1, 1), PI / 4),
    ((0, 0, 1), (1, 0, 0), (1, 0, -1), 3 * PI / 4),
    ((0, 0, 1), (1, 0, 0), (1, 1, -SQRT_2), 3 * PI / 4),
    ((0, 0, 1), (0, 0, -1), (0, 0, -1), PI),
]


@pytest.mark.parametrize("x,a,b,want", CHECK_MAX)
def test_max_distance(x, a, b, want):
    c2 = eu.max_chord2_point_to_edge(n(x), n(a), n(b))[0]
    got = 2.0 * math.asin(0.5 * math.sqrt(min(c2, 4.0)))
    assert abs(got - want) < 1e-14, (got, want)


def test_interpolate_basics():
    a, b = n((1, 0, 0)), n((0, 1, 0))
    assert np.allclose(eu.interpolate(0.0, a, b), a)
    assert np.allclose(eu.interpolate(1.0, a, b), b)
    mid = eu.interpolate(0.5, a, b)
    assert np.allclose(mid, n((1, 1, 0)), atol=1e-15)
    # extrapolation beyond B
    ext = eu.interpolate(2.0, a, b)
    assert np.allclose(ext, n((-1, 0, 0)), atol=1e-14)
    # distance-parameterized
    q = eu.interpolate_at_distance(PI / 4, a, b)
    assert abs(np.dot(q, a) - math.cos(PI / 4)) < 1e-15


def test_interpolate_against_distance_consistency():
    rng = np.random.default_rng(7)
    for _ in range(50):
        a = n(rng.normal(size=3))
        b = n(rng.normal(size=3))
        t = rng.uniform(0.05, 0.95)
        p = eu.interpolate(t, a, b)
        full = math.atan2(np.linalg.norm(np.cross(a, b)), np.dot(a, b))
        part = math.atan2(np.linalg.norm(np.cross(a, p)), np.dot(a, p))
        assert abs(part - t * full) < 1e-12
        # p lies on the great circle of AB
        assert abs(np.dot(p, n(np.cross(a, b)))) < 1e-12


def test_batch_consistency_random():
    """Vectorized batch result == per-point result, and brute force dominates."""
    rng = np.random.default_rng(11)
    a = n(rng.normal(size=3))
    b = n(rng.normal(size=3))
    xs = rng.normal(size=(500, 3))
    xs /= np.linalg.norm(xs, axis=1, keepdims=True)
    batch = eu.chord2_point_to_edge(xs, a, b)
    for i in range(0, 500, 37):
        single = eu.chord2_point_to_edge(xs[i], a, b)[0]
        # numpy routes (n,3)@(3,) through gemv but (3,)@(3,) through dot —
        # last-ulp differences are expected and harmless
        assert abs(single - batch[i]) <= 4 * np.finfo(float).eps * max(single, 1e-300)
    # distance to the segment <= distance to each endpoint
    xa2 = np.sum((xs - a) ** 2, axis=1)
    xb2 = np.sum((xs - b) ** 2, axis=1)
    assert np.all(batch <= np.minimum(xa2, xb2) + 1e-12)
    # and >= distance to the full great circle
    c = n(np.cross(a, b))
    sin_d = np.abs(xs @ c)
    gc_chord2 = 4 * (np.sin(np.arcsin(np.clip(sin_d, 0, 1)) / 2) ** 2)
    assert np.all(batch >= gc_chord2 - 1e-12)


# metric.rs:177-211 boundary cases
def test_metric_levels():
    from rust_s2_spark.kernel.constants import AVG_EDGE, MAX_LEVEL

    m = AVG_EDGE  # dim 1
    for level in range(-2, MAX_LEVEL + 3):
        want = max(0, min(MAX_LEVEL, level))
        # min_level/max_level at exact powers (metric.rs:177-199 semantics)
        val = m.value(max(0, min(MAX_LEVEL, level)))
        assert m.min_level(val) == want
        assert m.max_level(val) == want
        assert m.closest_level(val) == want
        # closest_level rounds to nearer level at sqrt(2) boundaries
        assert m.closest_level(val / 1.3) == want
        if want < MAX_LEVEL:
            assert m.closest_level(val / 1.5) == min(MAX_LEVEL, want + 1)
