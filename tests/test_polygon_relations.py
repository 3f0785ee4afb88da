"""Polygon-polygon relations + cellid path-format oracles.

Polygon semantics per polygon.rs:1064-1220 (shell/hole algebra);
path format per cellid.rs:186-204, 804-812.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel.pip import (
    Loop,
    Polygon,
    loop_compare_boundary,
    polygon_contains_polygon,
    polygon_intersects_polygon,
)


def P(*texts: str) -> Polygon:
    return Polygon([Loop.from_latlng_text(t) for t in texts])


SHELL = "0:0, 0:30, 30:30, 30:0"
HOLE = "10:10, 10:20, 20:20, 20:10"  # CCW around the hole area


def test_single_loop_polygons_delegate_to_loops():
    a = P("0:0, 0:40, 40:40, 40:0")
    b = P("5:5, 5:15, 15:15, 15:5")
    assert polygon_contains_polygon(a, b)
    assert not polygon_contains_polygon(b, a)
    assert polygon_intersects_polygon(a, b)


def test_polygon_with_hole_contains():
    annulus = P(SHELL, HOLE)
    inside_ring = P("2:2, 2:8, 8:8, 8:2")
    inside_hole = P("12:12, 12:18, 18:18, 18:12")
    outside = P("-20:0, -20:10, -10:10, -10:0")

    assert polygon_contains_polygon(annulus, inside_ring)
    assert not polygon_contains_polygon(annulus, inside_hole)
    assert not polygon_contains_polygon(annulus, outside)

    assert polygon_intersects_polygon(annulus, inside_ring)
    assert not polygon_intersects_polygon(annulus, inside_hole)
    assert not polygon_intersects_polygon(annulus, outside)


def test_polygon_hole_nesting():
    annulus = P(SHELL, HOLE)
    # b with a hole that swallows A's hole: A contains b's ring region
    b = P("5:5, 5:25, 25:25, 25:5", "9:9, 9:21, 21:21, 21:9")
    assert polygon_contains_polygon(annulus, b)
    # b without the hole overlaps A's hole -> not contained, but intersects
    b2 = P("5:5, 5:25, 25:25, 25:5")
    assert not polygon_contains_polygon(annulus, b2)
    assert polygon_intersects_polygon(annulus, b2)


def test_polygon_straddling_hole_boundary():
    annulus = P(SHELL, HOLE)
    straddle = P("5:12, 5:18, 15:18, 15:12")  # crosses the hole's boundary
    assert not polygon_contains_polygon(annulus, straddle)
    assert polygon_intersects_polygon(annulus, straddle)


def test_compare_boundary():
    big = Loop.from_latlng_text("0:0, 0:30, 30:30, 30:0")
    small = Loop.from_latlng_text("5:5, 5:15, 15:15, 15:5")
    crossing = Loop.from_latlng_text("-5:-5, -5:15, 15:15, 15:-5")
    far = Loop.from_latlng_text("-40:0, -40:10, -30:10, -30:0")
    assert loop_compare_boundary(big, small) == 1
    assert loop_compare_boundary(small, big) == -1
    assert loop_compare_boundary(big, crossing) == 0
    assert loop_compare_boundary(big, far) == -1


# cellid.rs path format: from_string/to_string round trips + error cases
def test_cellid_path_format():
    for s in ["0/", "3/001", "5/33333", "2/0123012301230123"]:
        cid = h.from_string(s)
        assert int(cid) != 0
        assert h.to_string(cid) == s
    # face-only forms
    for face in range(6):
        assert h.to_string(h.from_face(face)) == f"{face}/"
    # error cases (cellid.rs:1277-1286 spirit)
    for bad in ["", "7/", "3:0", "3/1234", "3/05", "x/0"]:
        assert int(h.from_string(bad)) == 0


def test_cellid_path_matches_child_positions():
    rng = np.random.default_rng(4)
    for _ in range(50):
        face = int(rng.integers(0, 6))
        lvl = int(rng.integers(0, 31))
        cid = h.from_face(face)
        path = f"{face}/"
        for _ in range(lvl):
            k = int(rng.integers(0, 4))
            cid = h.children(cid)[k]
            path += str(k)
        assert h.to_string(cid) == path
        assert int(h.from_string(path)) == int(cid)
