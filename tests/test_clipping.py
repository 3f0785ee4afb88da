"""Edge clipping to cube faces (kernel/clipping.py; edge_clipping.rs:55-760).

Property harness: for random geodesic edges, face_segments must form a
continuous path from A to B with every vertex on the great circle of AB,
and clip_to_padded_face must return a sub-segment of AB inside the padded
square exactly when the edge intersects it.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_s2_spark.kernel import clipping, stuv

rng = np.random.default_rng(42)


def rand_pt():
    v = rng.normal(size=3)
    return v / np.linalg.norm(v)


def uv_to_unit(face, u, v):
    p = np.array([float(c) for c in stuv.face_uv_to_xyz(face, u, v)])
    return p / np.linalg.norm(p)


def test_face_segments_properties():
    for _ in range(300):
        a, b = rand_pt(), rand_pt()
        segs = clipping.face_segments(a, b)
        assert 1 <= len(segs) <= 5
        pts = [(uv_to_unit(f, *sa), uv_to_unit(f, *sb)) for f, sa, sb in segs]
        assert np.linalg.norm(pts[0][0] - a) < 1e-12
        assert np.linalg.norm(pts[-1][1] - b) < 1e-12
        for i in range(len(pts) - 1):
            assert np.linalg.norm(pts[i][1] - pts[i + 1][0]) < 1e-12
        n = np.cross(a, b)
        nn = np.linalg.norm(n)
        if nn > 1e-9:
            n /= nn
            for pa, pb in pts:
                assert abs(float(pa @ n)) < 1e-10
                assert abs(float(pb @ n)) < 1e-10
        # every segment's vertices are in its face square
        for f, sa, sb in segs:
            for u, v in (sa, sb):
                assert abs(u) <= 1 + 1e-12 and abs(v) <= 1 + 1e-12


def test_face_segments_same_face_fast_path():
    a = uv_to_unit(2, -0.5, 0.3)
    b = uv_to_unit(2, 0.4, -0.2)
    segs = clipping.face_segments(a, b)
    assert len(segs) == 1 and segs[0][0] == 2


def test_clip_to_padded_face_contract():
    for _ in range(1000):
        a, b = rand_pt(), rand_pt()
        f = int(rng.integers(0, 6))
        got = clipping.clip_to_padded_face(a, b, f, 0.0)
        want = None
        for sf, sa, sb in clipping.face_segments(a, b):
            if sf == f:
                want = (sa, sb)
        if want is not None:
            assert got is not None  # never misses a real intersection
        if got is None:
            continue
        (ga, gb) = got
        assert max(abs(ga[0]), abs(ga[1]), abs(gb[0]), abs(gb[1])) <= 1 + 1e-12
        n = np.cross(a, b)
        nn = np.linalg.norm(n)
        if nn < 1e-9:
            continue
        n /= nn
        for u, v in (ga, gb):
            p = uv_to_unit(f, u, v)
            # on the great circle of AB and within the arc span
            assert abs(float(p @ n)) < 1e-10
            assert float(np.cross(a, p) @ n) > -1e-9
            assert float(np.cross(p, b) @ n) > -1e-9


def test_clip_padding_monotone():
    for _ in range(300):
        a, b = rand_pt(), rand_pt()
        f = int(rng.integers(0, 6))
        g0 = clipping.clip_to_padded_face(a, b, f, 0.0)
        g1 = clipping.clip_to_padded_face(a, b, f, 0.5)
        if g0 is not None:
            assert g1 is not None  # padding only grows the clip region


def test_clip_edge_2d():
    r = (-0.5, 0.5, -0.5, 0.5)
    assert clipping.clip_edge((-1, 0.2), (1, 0.2), r) == ((-0.5, 0.2), (0.5, 0.2))
    assert clipping.clip_edge((0.6, -1), (0.6, 1), r) is None
    a, b = clipping.clip_edge((-1, -1), (1, 1), r)
    assert a == (-0.5, -0.5) and b == (0.5, 0.5)
    # endpoint order follows the edge direction
    b2, a2 = clipping.clip_edge((1, 1), (-1, -1), r)
    assert (b2, a2) == (b, a)


def test_edge_intersects_rect():
    r = (-0.5, 0.5, -0.5, 0.5)
    assert clipping.edge_intersects_rect((-1, 0), (1, 0), r)
    assert not clipping.edge_intersects_rect((0.6, -1), (0.6, 1), r)
    assert clipping.edge_intersects_rect((0.5, 0.5), (1, 1), r)  # corner touch
    assert not clipping.edge_intersects_rect((0.51, 0.52), (1, 1), r)
    # consistency with clip_edge on a random battery
    for _ in range(500):
        a = tuple(rng.uniform(-1.5, 1.5, 2))
        b = tuple(rng.uniform(-1.5, 1.5, 2))
        got = clipping.edge_intersects_rect(a, b, r)
        want = clipping.clip_edge(a, b, r) is not None
        assert got == want, (a, b)


def test_interpolate_exact_endpoints():
    assert clipping.interpolate_f64(3.0, 3.0, 7.0, 10.0, 20.0) == 10.0
    assert clipping.interpolate_f64(7.0, 3.0, 7.0, 10.0, 20.0) == 20.0
    mid = clipping.interpolate_f64(5.0, 3.0, 7.0, 10.0, 20.0)
    assert 10.0 <= mid <= 20.0
