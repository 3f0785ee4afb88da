"""Completeness ops: distance_from_begin, cellid uv/st bounds,
expanded_by_distance_uv, face uvw frames, Rect.boundary_intersects,
CellUnion cap/rect bounds (cellid.rs:585-668, 750-789; stuv.rs:200-240;
rect.rs:216-240; cellunion.rs:197-243)."""

from __future__ import annotations

import math

import numpy as np

from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert, stuv
from rust_s2_spark.kernel.covering import CellUnion, RegionCoverer
from rust_s2_spark.kernel.region import Cap, Cell, Rect, _latlng_point


def P(lat, lng):
    return _latlng_point(math.radians(lat), math.radians(lng))


def test_distance_from_begin():
    c0 = h.from_face_pos_level(0, 0, 10)
    assert h.distance_from_begin(c0) == 0
    cur = np.uint64(c0)
    for want in range(1, 6):
        cur = h.next_cell(cur)
        assert h.distance_from_begin(cur) == want
    # monotone across faces: first level-3 cell of face 1 is 6*... no — it's
    # 64 cells per face at level 3
    f1 = h.from_face_pos_level(1, 0, 3)
    assert h.distance_from_begin(f1) == 4**3
    # vectorized
    arr = np.array([int(c0), int(f1)], dtype=np.uint64)
    got = h.distance_from_begin(arr)
    assert list(got) == [0, 4**3]


def test_cellid_center_and_bound_uv():
    for f, pos, lvl in [(0, 0, 10), (3, 1234, 8), (5, 77, 14)]:
        cid = np.uint64(h.from_face_pos_level(f, pos, lvl))
        cf, u, v = hilbert.cellid_center_uv(cid)
        bf, u_lo, u_hi, v_lo, v_hi = hilbert.cellid_bound_uv(cid)
        assert int(cf) == int(bf) == f
        assert u_lo < u < u_hi and v_lo < v < v_hi
        # bound must match the Cell decode exactly
        cell = Cell(int(cid))
        assert math.isclose(u_lo, cell.u_lo, abs_tol=1e-15)
        assert math.isclose(u_hi, cell.u_hi, abs_tol=1e-15)
        assert math.isclose(v_lo, cell.v_lo, abs_tol=1e-15)
        assert math.isclose(v_hi, cell.v_hi, abs_tol=1e-15)


def test_expanded_by_distance_uv():
    cid = np.uint64(h.from_face_pos_level(2, 99, 12))
    _, u_lo, u_hi, v_lo, v_hi = hilbert.cellid_bound_uv(cid)
    e = hilbert.expanded_by_distance_uv(u_lo, u_hi, v_lo, v_hi, 0.01)
    assert e[0] < u_lo and e[1] > u_hi and e[2] < v_lo and e[3] > v_hi
    # shrink with negative distance
    s = hilbert.expanded_by_distance_uv(u_lo, u_hi, v_lo, v_hi, -1e-6)
    assert s[0] > u_lo and s[1] < u_hi


def test_face_uvw_frames():
    for f in range(6):
        u, v, w = stuv.u_axis(f), stuv.v_axis(f), stuv.unit_norm(f)
        # right-handed orthonormal frame
        assert np.allclose(np.cross(u, v), w)
        assert abs(float(u @ v)) < 1e-15
        # w is the face normal: center of face f maps to +w
        x, y, z = stuv.face_uv_to_xyz(f, 0.0, 0.0)
        assert np.allclose([float(x), float(y), float(z)], w)
        # neighbor table: u/v axes name adjacent faces; the +w entry is the
        # face itself and the -w entry its antipode
        for axis in range(2):
            for d in (0, 1):
                g = stuv.uvw_face(f, axis, d)
                assert 0 <= g < 6 and g != f
        assert stuv.uvw_face(f, 2, 1) == f
        assert stuv.uvw_face(f, 2, 0) == (f + 3) % 6
    # projection into the frame recovers (u, v, w) dots
    p = P(10, 20)
    uvw = stuv.face_xyz_to_uvw(0, p)
    assert np.allclose(
        uvw, [float(p @ stuv.u_axis(0)), float(p @ stuv.v_axis(0)), float(p @ stuv.unit_norm(0))]
    )


def test_rect_boundary_intersects():
    r = Rect.from_degrees(10, 10, 30, 30)
    assert r.boundary_intersects(P(20, 5), P(20, 20))  # crosses west lng edge
    assert r.boundary_intersects(P(25, 20), P(35, 20))  # crosses north lat edge
    assert not r.boundary_intersects(P(15, 15), P(25, 25))  # fully inside
    assert not r.boundary_intersects(P(50, 50), P(60, 60))  # fully outside
    assert not Rect.empty().boundary_intersects(P(0, 0), P(1, 1))
    # edge spanning the whole rect crosses both lng edges
    assert r.boundary_intersects(P(20, 0), P(20, 40))


def test_cellunion_bounds():
    cap = Cap.from_latlng_radius(40.0, -100.0, 3.0)
    cu = RegionCoverer(max_cells=8).covering(cap)
    cb = cu.cap_bound()
    rb = cu.rect_bound()
    for ci in cu.ids:
        c = Cell(ci)
        for k in range(4):
            v = c.vertex(k)
            assert cb.contains_point(v)
            lat = math.atan2(v[2], math.hypot(v[0], v[1]))
            lng = math.atan2(v[1], v[0])
            assert rb.contains_latlng_rad(lat, lng)
    assert CellUnion([]).rect_bound().is_empty
    assert CellUnion([]).cap_bound().radius2 < 0  # empty cap sentinel


def test_rect_accessors():
    """from_center_size / from_point_pair / size / area / centroid /
    intersection / union / interior ops (rect.rs:62-165, 241-243, 710-727,
    741-805)."""
    from rust_s2_spark.kernel.region import Rect

    r = Rect.from_degrees(10, 10, 30, 30)
    assert r.is_valid and not r.is_point and not r.is_inverted
    slat, slng = r.size()
    assert abs(slat - math.radians(20)) < 1e-15
    assert abs(slng - math.radians(20)) < 1e-15
    # analytic area: lng_len * (sin(hi) - sin(lo))
    assert abs(
        r.area() - math.radians(20) * (math.sin(math.radians(30)) - math.sin(math.radians(10)))
    ) < 1e-15
    # centroid normalizes into the rect, on the lng center plane
    c = r.centroid()
    cn = c / np.linalg.norm(c)
    lat = math.degrees(math.asin(cn[2]))
    lng = math.degrees(math.atan2(cn[1], cn[0]))
    assert 10 < lat < 30 and abs(lng - 20) < 1e-9
    # area-prescaled: |centroid| relates to area (nonzero)
    assert np.linalg.norm(c) > 0
    r2 = Rect.from_degrees(20, 20, 40, 40)
    i = r.intersection(r2)
    assert abs(math.degrees(i.lat.lo) - 20) < 1e-12 and abs(math.degrees(i.lat.hi) - 30) < 1e-12
    u = r.union(r2)
    assert abs(math.degrees(u.lat.lo) - 10) < 1e-12 and abs(math.degrees(u.lat.hi) - 40) < 1e-12
    assert r.intersection(Rect.from_degrees(50, 50, 60, 60)).is_empty
    assert r.interior_contains_rect(Rect.from_degrees(15, 15, 25, 25))
    assert not r.interior_contains_rect(r)  # shares boundary
    assert r.interior_intersects_rect(r2)
    assert not r.interior_intersects_rect(Rect.from_degrees(30, 30, 50, 50))  # touch only
    assert r.interior_contains_latlng_rad(math.radians(20), math.radians(20))
    assert not r.interior_contains_latlng_rad(math.radians(10), math.radians(20))
    fc = Rect.from_center_size(
        math.radians(20), math.radians(20), math.radians(20), math.radians(20)
    )
    assert abs(math.degrees(fc.lat.lo) - 10) < 1e-9 and abs(math.degrees(fc.lng.hi) - 30) < 1e-9
    pp = Rect.from_point_pair(
        math.radians(5), math.radians(170), math.radians(-5), math.radians(-170)
    )
    assert pp.is_inverted  # the short way around crosses the antimeridian
    assert Rect.from_degrees(1, 1, 1, 1).is_point


def test_cap_accessors():
    """is_valid / interior containment / interior intersection / approx_eq
    (cap.rs:143-145, 202-219)."""
    from rust_s2_spark.kernel.region import Cap

    cap = Cap.from_latlng_radius(10, 10, 5)
    assert cap.is_valid
    assert cap.interior_contains_point(P(10, 10))
    assert not cap.interior_contains_point(P(20, 10))
    assert cap.interior_intersects_cap(Cap.from_latlng_radius(14, 10, 5))
    assert not cap.interior_intersects_cap(Cap.from_latlng_radius(40, 10, 5))
    assert cap.approx_eq(Cap.from_latlng_radius(10, 10, 5))
    assert not cap.approx_eq(Cap.from_latlng_radius(10, 10, 6))
    assert not Cap.empty().interior_intersects_cap(cap)


def test_point_frames():
    """get_frame/to_frame/from_frame/planar_centroid (point.rs:226-257, 419)."""
    from rust_s2_spark.kernel.pip import (
        from_frame,
        get_frame,
        planar_centroid,
        to_frame,
    )

    p = P(37.7, -122.4)
    m = get_frame(p)
    assert np.allclose(m @ m.T, np.eye(3))  # orthonormal
    assert np.allclose(m[:, 2], p)  # z column is the point
    assert np.linalg.det(m) > 0.99  # right-handed
    q = np.array([0.3, 0.4, 0.5])
    assert np.allclose(to_frame(m, from_frame(m, q)), q)
    assert np.allclose(from_frame(m, to_frame(m, p)), p)
    pts = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    assert np.allclose(planar_centroid(pts), np.ones(3) / np.sqrt(3))


def test_cellid_wrapping():
    """Reference wrap vectors: cellid.rs:1536-1643 (test_cellid_wrapping)."""
    from rust_s2_spark.kernel.constants import MAX_LEVEL

    cid = h.from_face_pos_level(3, 0x12345678, MAX_LEVEL - 4)

    # wrap from beginning to end of Hilbert curve
    assert h.prev_cell(h.child_end_at_level(h.from_face(5), 0)) == h.prev_wrap(
        h.child_begin_at_level(h.from_face(0), 0)
    )
    # smallest end leaf wraps to smallest first leaf (prev_wrap and advance_wrap)
    last_leaf = h.from_face_pos_level(5, (2**64 - 1) >> 3, MAX_LEVEL)
    first_leaf = h.child_begin_at_level(h.from_face(0), MAX_LEVEL)
    assert h.prev_wrap(first_leaf) == last_leaf
    assert h.advance_wrap(first_leaf, -1) == last_leaf
    assert h.advance_wrap(first_leaf, -1) == h.prev_wrap(first_leaf)
    # prev + next_wrap stays the same at given level
    assert h.next_wrap(h.prev_cell(h.child_end_at_level(h.from_face(5), 4))) == (
        h.child_begin_at_level(h.from_face(0), 4)
    )
    assert h.advance_wrap(h.advance(h.child_end_at_level(h.from_face(5), 4), -1), 1) == (
        h.child_begin_at_level(h.from_face(0), 4)
    )
    # prev().next_wrap() stays same for first cell at level
    assert h.next_wrap(h.prev_cell(h.child_end_at_level(h.from_face(5), MAX_LEVEL))) == (
        h.from_face_pos_level(0, 0, MAX_LEVEL)
    )
    assert h.advance_wrap(h.advance(h.child_end_at_level(h.from_face(5), MAX_LEVEL), -1), 1) == (
        h.from_face_pos_level(0, 0, MAX_LEVEL)
    )
    # advancing 7 steps around cube ends one past start
    f0 = h.child_begin_at_level(h.from_face(0), 0)
    assert h.advance_wrap(f0, 7) == h.from_face(1)
    # twice around ends where we started
    assert h.advance_wrap(f0, 12) == f0
    # backwards once around plus one step is one before start
    assert h.advance_wrap(h.from_face(5), -7) == h.from_face(4)
    # wrapping even multiple of times around ends where we started
    assert h.advance_wrap(f0, -12000000) == f0
    # wrapping combination of even times around ends where it started
    b5 = h.child_begin_at_level(h.from_face(0), 5)
    assert h.advance_wrap(b5, 6644) == h.advance_wrap(b5, -11788)
    # moving 256 advances one cell at max level
    assert h.advance_wrap(h.child_begin_at_level(cid, MAX_LEVEL), 256) == (
        h.child_begin_at_level(h.next_cell(cid), MAX_LEVEL)
    )
    # wrapping by 4x cells-per-face advances 4 faces
    assert h.advance_wrap(
        h.from_face_pos_level(5, 0, MAX_LEVEL), 2 << (2 * MAX_LEVEL)
    ) == h.from_face_pos_level(1, 0, MAX_LEVEL)
    # steps == 0 is the identity
    assert h.advance_wrap(cid, 0) == cid

    # vectorized parity: every scalar case above replayed through one array call
    cids = np.array(
        [int(first_leaf), int(f0), int(f0), int(h.from_face(5)), int(f0), int(b5), int(b5)],
        dtype=np.uint64,
    )
    steps = np.array([-1, 7, 12, -7, -12000000, 6644, -11788], dtype=np.int64)
    got = h.advance_wrap(cids, steps)
    want = [h.advance_wrap(c, s) for c, s in zip(cids, steps)]
    assert [int(g) for g in got] == [int(w) for w in want]
    # next_wrap/prev_wrap vectorized round-trip at random levels
    rng = np.random.default_rng(7)
    faces = rng.integers(0, 6, 50)
    lvls = rng.integers(0, 31, 50)
    pos = rng.integers(0, 2**61, 50, dtype=np.uint64)
    cells = np.array(
        [int(h.from_face_pos_level(int(f), int(p), int(l))) for f, p, l in zip(faces, pos, lvls)],
        dtype=np.uint64,
    )
    assert np.array_equal(h.prev_wrap(h.next_wrap(cells)), cells)
    assert np.array_equal(h.next_wrap(h.prev_wrap(cells)), cells)
    assert np.array_equal(h.advance_wrap(cells, 3), h.advance_wrap(h.advance_wrap(cells, 1), 2))
