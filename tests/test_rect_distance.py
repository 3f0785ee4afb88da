"""Rect distance / Hausdorff + Cap union/centroid oracles.

Vectors: s1/interval.rs:964-980, r1/interval.rs:397-402, and the sampled
verification harness + rect pairs of rect.rs:2192-2335 (incl. degenerate
Voronoi cases).  Cap union/centroid follow cap.rs:426-474 canonical math.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernel.region import Cap, RInterval, Rect, SInterval, chord_from_angle

PI = math.pi


def test_r1_directed_hausdorff():
    EMPTY = RInterval.empty()
    UNIT = RInterval(0.0, 1.0)
    HALF = RInterval(0.5, 0.5)
    assert EMPTY.directed_hausdorff_distance(UNIT) == 0.0
    assert UNIT.directed_hausdorff_distance(EMPTY) == np.inf
    assert abs(HALF.directed_hausdorff_distance(HALF)) < 1e-15
    assert abs(HALF.directed_hausdorff_distance(RInterval(1.0, 2.0)) - 0.5) < 1e-15
    assert abs(RInterval(1.0, 2.0).directed_hausdorff_distance(HALF) - 1.5) < 1e-15


def test_s1_directed_hausdorff():
    empty = SInterval.empty()
    mid12 = SInterval(PI / 2 - 0.01, PI / 2 + 0.02)
    quad12 = SInterval.from_endpoints(0, PI)
    quad123 = SInterval.from_endpoints(0, -PI / 2)
    cc0 = SInterval(3.0, -3.0)  # complement center at 0
    cases = [
        (empty, empty, 0.0),
        (empty, mid12, 0.0),
        (mid12, empty, PI),
        (quad12, quad123, 0.0),
        (SInterval(-0.1, 0.2), cc0, 3.0),
        (SInterval(0.1, 0.2), cc0, 3.0 - 0.1),
        (SInterval(-0.2, -0.1), cc0, 3.0 - 0.1),
    ]
    for a, b, want in cases:
        got = a.directed_hausdorff_distance(b)
        assert abs(got - want) < 1e-13, (a.lo, a.hi, b.lo, b.hi, got, want)


def _verify_directed_hausdorff(a: Rect, b: Rect):
    """Sampled lower-bound check (rect.rs:2156-2190 harness)."""
    resolution = 0.1
    got = a.directed_hausdorff_distance(b)
    n_lat = int(round(a.lat.length / resolution)) + 1
    n_lng = int(round(b.lng.length / resolution)) + 1  # noqa: F841 (parity)
    n_lng = int(round(a.lng.length / resolution)) + 1
    d_lat = a.lat.length / n_lat
    d_lng = a.lng.length / n_lng
    max_d = 0.0
    lng = a.lng.lo
    for _ in range(n_lng + 1):
        lat = a.lat.lo
        for _ in range(n_lat + 1):
            nlat = max(-PI / 2, min(PI / 2, lat))
            nlng = math.atan2(math.sin(lng), math.cos(lng))
            max_d = max(max_d, b.distance_to_latlng_rad(nlat, nlng))
            lat += d_lat
        lng += d_lng
    assert max_d <= got + 1e-10, (max_d, got)
    assert max_d >= got - resolution, (max_d, got)


RECT_PAIRS = [
    # contained
    (Rect.from_degrees(-10, 20, -5, 90), Rect.from_degrees(-51, 20, 48, 90)),
    # point to rect
    (Rect.from_degrees(5, 8, 5, 8), Rect.from_degrees(-10, 0, 10, 20)),
    (Rect.from_degrees(5, 8, 5, 8), Rect.from_degrees(-10, -200, 10, -100)),
    # rect to point
    (Rect.from_degrees(-10, 0, 10, 20), Rect.from_degrees(5, 8, 5, 8)),
    # near pole
    (Rect.from_degrees(70, 100, 80, 150), Rect.from_degrees(60, -170, 70, -150)),
    # degenerate cases from rect.rs:2285-2335
    (Rect.from_degrees(-4, -10, 4, 0), Rect.from_degrees(0, 10, 90, 20)),
    (Rect.from_degrees(-50, -10, 50, 10), Rect.from_degrees(30, -10, 60, 10)),
    (Rect.from_degrees(10, 170, 30, 180), Rect.from_degrees(-50, -10, 50, 10)),
    (Rect.from_degrees(10, -180, 30, -170), Rect.from_degrees(-50, -10, 50, 10)),
    (Rect.from_degrees(-30, 170, 30, 180), Rect.from_degrees(-10, -90, 10, 90)),
    (Rect.from_degrees(-30, -180, 30, -170), Rect.from_degrees(-10, -90, 10, 90)),
    (Rect.from_degrees(-20, 105, 20, 110), Rect.from_degrees(-30, 5, 30, 15)),
    (Rect.from_degrees(-20, 95, 20, 105), Rect.from_degrees(-30, 5, 30, 15)),
]


@pytest.mark.parametrize("i", range(len(RECT_PAIRS)))
def test_directed_hausdorff_pairs(i):
    a, b = RECT_PAIRS[i]
    _verify_directed_hausdorff(a, b)
    # symmetry of the undirected distance
    assert a.hausdorff_distance(b) == b.hausdorff_distance(a)


def test_directed_hausdorff_random_point_rects():
    rng = np.random.default_rng(3)
    for _ in range(60):
        lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 4)))
        lngs = rng.uniform(-180, 180, 4)
        a = Rect.from_degrees(min(lats[0], lats[1]), lngs[0], max(lats[0], lats[1]), lngs[1])
        b = Rect.from_degrees(min(lats[2], lats[3]), lngs[2], max(lats[2], lats[3]), lngs[3])
        _verify_directed_hausdorff(a, b)


def test_distance_to_latlng_brute():
    rng = np.random.default_rng(9)
    rect = Rect.from_degrees(-20, 30, 10, 80)
    for _ in range(200):
        lat = math.degrees(math.asin(rng.uniform(-1, 1)))
        lng = rng.uniform(-180, 180)
        got = rect.distance_to_latlng_rad(math.radians(lat), math.radians(lng))
        # brute force: sample rect boundary + containment
        if rect.contains_latlng_rad(math.radians(lat), math.radians(lng)):
            assert got == 0.0
            continue
        best = PI
        from rust_s2_spark.kernel.region import _latlng_point

        p = _latlng_point(math.radians(lat), math.radians(lng))
        for la in np.linspace(rect.lat.lo, rect.lat.hi, 60):
            for ln in [rect.lng.lo, rect.lng.hi]:
                q = _latlng_point(la, ln)
                best = min(best, math.atan2(np.linalg.norm(np.cross(p, q)), np.dot(p, q)))
        for ln in np.linspace(rect.lng.lo, rect.lng.hi, 120):
            for la in [rect.lat.lo, rect.lat.hi]:
                q = _latlng_point(la, ln)
                best = min(best, math.atan2(np.linalg.norm(np.cross(p, q)), np.dot(p, q)))
        assert got <= best + 1e-9
        assert got >= best - 0.02  # sampling resolution


def test_cap_union():
    # cap.rs:551-620 (commented Go vectors) spirit
    a = Cap.from_latlng_radius(50.0, 10.0, 0.2)
    b = Cap.from_latlng_radius(50.0, 10.0, 0.3)
    assert b.contains_cap(a)
    got = b.union(a)
    assert abs(got.radius_rad() - b.radius_rad()) < 1e-12
    # disjoint caps: union contains both
    c = Cap.from_latlng_radius(51.0, 11.0, 1.5)
    u = a.union(c)
    assert u.contains_cap(a) and u.contains_cap(c)
    # union with empty = self
    assert a.union(Cap.empty()).radius2 == a.radius2
    # union with full = full
    assert a.union(Cap.full()).is_full


def test_cap_centroid():
    assert np.allclose(Cap.empty().centroid(), 0.0)
    # hemisphere at north pole: centroid on +z, magnitude r*area with r=0.5
    hemi = Cap(np.array([0.0, 0.0, 1.0]), 2.0)  # height 1
    c = hemi.centroid()
    assert c[0] == 0 and c[1] == 0
    assert abs(c[2] - 0.5 * hemi.area()) < 1e-12
    # centroid additivity: cap + complement = 0 (sphere centroid)
    cap = Cap.from_latlng_radius(30.0, 40.0, 35.0)
    total = cap.centroid() + cap.complement().centroid()
    assert np.allclose(total, 0.0, atol=1e-12)


def test_cap_add_point_and_cap():
    import numpy as np

    from rust_s2_spark.kernel.region import Cap, _latlng_point

    c = Cap.empty()
    p1 = _latlng_point(0.3, 0.4)
    p2 = _latlng_point(-0.2, 0.9)
    c = c.add_point(p1)
    assert c.contains_point(p1) and c.radius2 == 0.0
    c = c.add_point(p2)
    assert c.contains_point(p1) and c.contains_point(p2)
    # add_cap: containment of the added cap
    a = Cap.from_latlng_radius(10, 20, 3.0)
    b = Cap.from_latlng_radius(12, 25, 2.0)
    u = a.add_cap(b)
    assert u.contains_cap(a) and u.contains_cap(b)
    assert Cap.empty().add_cap(b).radius2 == b.radius2
    assert a.add_cap(Cap.empty()).radius2 == a.radius2
    # constructors
    h = Cap.from_center_height(np.array([0.0, 0.0, 1.0]), 1.0)
    assert abs(h.area() - 2 * np.pi) < 1e-12
    ar = Cap.from_center_area(np.array([0.0, 0.0, 1.0]), np.pi)
    assert abs(ar.area() - np.pi) < 1e-12
