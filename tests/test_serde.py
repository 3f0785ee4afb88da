"""Loop/Polygon binary encode/decode vs the reference layout
(loop.rs:1363-1559)."""

import math
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.kernel import hierarchy, hilbert
from rust_s2_spark.kernel.pip import Loop, Polygon
from rust_s2_spark.kernel.serde import (
    loop_decode,
    loop_decode_compressed,
    loop_encode,
    loop_encode_compressed,
    polygon_decode,
    polygon_encode,
)


def _regular(lat, lng, radius_deg, n):
    return Loop.from_latlng_text(
        ", ".join(
            f"{lat + radius_deg * math.cos(2 * math.pi * k / n)}:"
            f"{lng + radius_deg * math.sin(2 * math.pi * k / n)}"
            for k in range(n)
        )
    )


def test_encode_byte_layout():
    """Exact byte layout: version=1, u32-BE count, origin byte, f64-BE xyz
    per vertex (loop.rs:1370-1393)."""
    lp = _regular(10.0, 20.0, 5.0, 4)
    data = loop_encode(lp)
    assert len(data) == 6 + 24 * 4
    assert data[0] == 1
    assert struct.unpack(">I", data[1:5])[0] == 4
    assert data[5] == (1 if lp.origin_inside else 0)
    # Vertex 2, coordinate y sits at offset 6 + 2*24 + 8.
    (y2,) = struct.unpack(">d", data[6 + 48 + 8 : 6 + 48 + 16])
    assert y2 == lp.vertices[2][1]


def test_lossless_round_trip_exact():
    lp = _regular(-33.9, 151.2, 2.5, 17)
    back = loop_decode(loop_encode(lp))
    np.testing.assert_array_equal(back.vertices, lp.vertices)
    assert back.origin_inside == lp.origin_inside
    assert back.bound.contains_rect(lp.bound) and lp.bound.contains_rect(back.bound)


def test_origin_flag_is_authoritative():
    """The stored flag overrides recomputation (loop.rs:1445-1449), so an
    inverted (complement) loop survives the round trip."""
    # _regular traces clockwise in (lat,lng), so its interior is the BIG
    # region (sphere minus the disc) and the origin is inside.
    lp = _regular(45.0, 7.0, 3.0, 8)
    assert lp.origin_inside
    back = loop_decode(loop_encode(lp))
    assert back.origin_inside
    inv = lp.invert()  # the small disc
    assert not inv.origin_inside
    inv_back = loop_decode(loop_encode(inv))
    assert not inv_back.origin_inside
    # north pole, far from the ring
    px, py, pz = np.array([0.0]), np.array([0.0]), np.array([1.0])
    assert back.contains_points(px, py, pz)[0] == lp.contains_points(px, py, pz)[0]
    assert inv_back.contains_points(px, py, pz)[0] == inv.contains_points(px, py, pz)[0]


def test_empty_and_full_sentinels_round_trip():
    for lp in (Loop.empty(), Loop.full()):
        back = loop_decode(loop_encode(lp))
        assert back.is_empty() == lp.is_empty()
        assert back.is_full() == lp.is_full()


def test_decode_errors():
    with pytest.raises(ValueError, match="too short"):
        loop_decode(b"\x01\x00")
    lp = _regular(0.0, 0.0, 1.0, 5)
    good = loop_encode(lp)
    with pytest.raises(ValueError, match="version"):
        loop_decode(b"\x02" + good[1:])
    with pytest.raises(ValueError, match="exactly"):
        loop_decode(good[:-8])
    with pytest.raises(ValueError, match="too short"):
        loop_decode_compressed(b"\x01")
    # exact-length checks make the two loop codecs disjoint: a compressed
    # blob can never parse as lossless (24a - 8b = 4 has no int solution)
    comp = loop_encode_compressed(lp, 16)
    with pytest.raises(ValueError):
        loop_decode(comp)
    with pytest.raises(ValueError):
        loop_decode_compressed(good)


def test_compressed_layout_and_snap():
    """Compressed form stores u64-BE CellIDs at the snap level
    (loop.rs:1464-1491); decode reconstructs cell centers."""
    snap = 20
    lp = _regular(48.85, 2.35, 1.0, 12)
    data = loop_encode_compressed(lp, snap)
    assert len(data) == 10 + 8 * 12
    assert data[0] == 1
    assert struct.unpack(">i", data[1:5])[0] == snap
    cids = np.frombuffer(data, dtype=">u8", count=12, offset=10).astype(np.uint64)
    v = lp.vertices
    expect = hierarchy.parent(
        np.atleast_1d(hilbert.cellid_from_xyz(v[:, 0], v[:, 1], v[:, 2])).astype(np.uint64),
        snap,
    )
    np.testing.assert_array_equal(cids, expect)
    back = loop_decode_compressed(data)
    # Snapped vertices move by at most the level-20 cell diagonal (~0.3 m).
    dots = np.clip(np.sum(back.vertices * lp.vertices, axis=1), -1, 1)
    assert np.arccos(dots).max() < 4e-6
    assert back.origin_inside == lp.origin_inside


def test_compressed_is_idempotent_at_snap_level():
    """Re-encoding an already-snapped loop at the same level is lossless:
    cell centers snap back to their own cell."""
    lp = _regular(-12.0, 77.0, 4.0, 9)
    once = loop_decode_compressed(loop_encode_compressed(lp, 16))
    twice = loop_decode_compressed(loop_encode_compressed(once, 16))
    np.testing.assert_array_equal(once.vertices, twice.vertices)


def test_polygon_round_trip_nested():
    shell = _regular(0.0, 0.0, 10.0, 16)
    hole = _regular(0.0, 0.0, 4.0, 12)
    poly = Polygon.from_loops([shell, hole])
    back = polygon_decode(polygon_encode(poly))
    assert back.num_loops() == poly.num_loops()
    assert [lp.depth for lp in back.loops] == [lp.depth for lp in poly.loops]
    probes = np.array(
        [
            [math.cos(math.radians(7)), 0.0, math.sin(math.radians(7))],  # in ring
            [1.0, 0.0, 0.0],  # in hole
            [0.0, 0.0, 1.0],  # outside
        ]
    )
    probes /= np.linalg.norm(probes, axis=1, keepdims=True)
    px, py, pz = probes[:, 0], probes[:, 1], probes[:, 2]
    np.testing.assert_array_equal(
        back.contains_points(px, py, pz), poly.contains_points(px, py, pz)
    )
    assert abs(back.area() - poly.area()) < 1e-12

    compact = polygon_decode(polygon_encode(poly, snap_level=24), compressed=True)
    assert compact.num_loops() == poly.num_loops()
    np.testing.assert_array_equal(
        compact.contains_points(px, py, pz), poly.contains_points(px, py, pz)
    )


@settings(max_examples=60, deadline=None)
@given(
    lat=st.floats(-80, 80),
    lng=st.floats(-179, 179),
    radius=st.floats(0.01, 20.0),
    n=st.integers(3, 64),
)
def test_lossless_round_trip_property(lat, lng, radius, n):
    """Any regular loop round-trips bit-exactly with identical containment."""
    lp = _regular(lat, lng, radius, n)
    back = loop_decode(loop_encode(lp))
    np.testing.assert_array_equal(back.vertices, lp.vertices)
    assert back.origin_inside == lp.origin_inside
    px = np.array([1.0, 0.0, 0.0, 0.577350269189626])
    py = np.array([0.0, 1.0, 0.0, 0.577350269189626])
    pz = np.array([0.0, 0.0, 1.0, 0.577350269189626])
    np.testing.assert_array_equal(
        back.contains_points(px, py, pz), lp.contains_points(px, py, pz)
    )


@settings(max_examples=40, deadline=None)
@given(
    lat=st.floats(-60, 60),
    lng=st.floats(-170, 170),
    radius=st.floats(0.5, 10.0),
    n=st.integers(4, 32),
    snap=st.integers(12, 30),
)
def test_compressed_round_trip_property(lat, lng, radius, n, snap):
    """Snapped vertices stay within the level's cell diagonal of the
    originals, and re-encoding at the same level is stable."""
    from rust_s2_spark.kernel.constants import MAX_DIAG

    lp = _regular(lat, lng, radius, n)
    back = loop_decode_compressed(loop_encode_compressed(lp, snap))
    # chord distance (exact in doubles; arccos loses ~1.5e-8 near 1.0),
    # chord = 2*sin(angle/2) <= angle, so the diagonal bounds it too
    chords = np.linalg.norm(back.vertices - lp.vertices, axis=1)
    assert chords.max() <= MAX_DIAG.value(snap) + 1e-15
    again = loop_decode_compressed(loop_encode_compressed(back, snap))
    np.testing.assert_array_equal(again.vertices, back.vertices)


def test_compressed_decode_rebuilds_bound_for_stored_flag():
    """When coarse snapping flips the recomputed origin_inside relative to
    the stored flag, decode must re-derive the bound for the STORED flag
    (loop.rs decode sets the flag before the bound); otherwise the bound
    prefilter contradicts the parity test."""
    from rust_s2_spark.kernel.pip import ORIGIN, Loop

    found = False
    for radius in (0.3, 0.5, 1.0, 2.0):
        for snap in (1, 2, 3):
            lp = _regular(-1.85, 165.0, radius, 8)  # near the S2 origin point
            data = loop_encode_compressed(lp, snap)
            stored = data[9] != 0
            raw = loop_decode_compressed(data)
            naive = Loop(raw.vertices.copy())
            if naive.origin_inside != stored:
                found = True
                # flag is authoritative...
                assert raw.origin_inside == stored
                # ...and self-consistent: the loop contains the S2 origin
                # point iff the flag says so (zero crossings from origin
                # to itself), THROUGH the bound-prefiltered path
                got = raw.contains_points(
                    np.array([ORIGIN[0]]), np.array([ORIGIN[1]]), np.array([ORIGIN[2]])
                )[0]
                assert bool(got) == stored, (radius, snap)
    assert found, "no flag-flip case exercised — adjust radii/snap levels"


def test_polygon_codec_marker():
    """The polygon frame records which loop codec it holds; decoding with a
    wrong expectation fails loudly instead of yielding garbage vertices."""
    outer = _regular(10.0, 20.0, 5.0, 8)
    poly = Polygon.from_loops([outer])
    lossless = polygon_encode(poly)
    compact = polygon_encode(poly, snap_level=24)
    assert lossless[0] == 0 and compact[0] == 1
    with pytest.raises(ValueError, match="Codec mismatch"):
        polygon_decode(lossless, compressed=True)
    with pytest.raises(ValueError, match="Codec mismatch"):
        polygon_decode(compact, compressed=False)
    # marker is authoritative: no flag needed at all
    assert len(polygon_decode(compact).loops) == 1
    with pytest.raises(ValueError, match="codec marker"):
        polygon_decode(b"\x07" + lossless[1:])
