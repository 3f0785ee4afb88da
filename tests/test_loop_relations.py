"""Loop-loop relation oracles (loop.rs:3171-4150 harness semantics).

Pairs drawn from the reference fixtures; nested / disjoint / crossing /
complement (shared-vertex wedge) cases.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_s2_spark.kernel.pip import (
    Loop,
    loop_contains_loop,
    loop_intersects_loop,
)
from tests.test_pip import FIXTURES, L


def _nested(a: Loop, b: Loop, b_empty: bool = False):
    """test_loop_one_nested_pair semantics (a contains b):
    intersects == !b.is_empty() in both directions."""
    assert loop_contains_loop(a, b)
    assert loop_intersects_loop(a, b) == (not b_empty)
    assert loop_intersects_loop(b, a) == (not b_empty)


def _disjoint(a: Loop, b: Loop, a_empty: bool = False, b_empty: bool = False):
    """test_loop_one_disjoint_pair semantics: contains == other.is_empty()."""
    assert not loop_intersects_loop(a, b)
    assert not loop_intersects_loop(b, a)
    assert loop_contains_loop(a, b) == b_empty
    assert loop_contains_loop(b, a) == a_empty


def _crossing(a: Loop, b: Loop):
    assert loop_intersects_loop(a, b)
    assert loop_intersects_loop(b, a)
    assert not loop_contains_loop(a, b)
    assert not loop_contains_loop(b, a)


def test_nested_pairs():
    _nested(L("north_hemi"), L("arctic80"))
    _nested(L("south_hemi"), L("antarctic80"))
    _nested(Loop.full(), L("candy_cane"))
    _nested(Loop.full(), Loop.empty(), b_empty=True)
    _nested(L("north_hemi"), Loop.empty(), b_empty=True)


def test_disjoint_pairs():
    _disjoint(L("arctic80"), L("antarctic80"))
    _disjoint(L("north_hemi"), L("antarctic80"))
    _disjoint(Loop.empty(), L("arctic80"), a_empty=True)
    _disjoint(Loop.empty(), Loop.empty(), a_empty=True, b_empty=True)


def test_crossing_pairs():
    _crossing(L("north_hemi"), L("east_hemi"))
    _crossing(L("north_hemi"), L("west_hemi"))
    _crossing(L("candy_cane"), L("north_hemi"))
    _crossing(L("candy_cane"), L("south_hemi"))


def test_complement_pair_shared_vertices():
    # north_hemi and south_hemi share every vertex and have disjoint
    # interiors: neither contains nor intersects the other (wedge logic).
    nh, sh = L("north_hemi"), L("south_hemi")
    assert not loop_contains_loop(nh, sh)
    assert not loop_contains_loop(sh, nh)
    assert not loop_intersects_loop(nh, sh)
    assert not loop_intersects_loop(sh, nh)


def test_self_relations():
    for name in ["north_hemi", "candy_cane", "arctic80", "loop_a"]:
        lp = L(name)
        assert loop_contains_loop(lp, lp), name
        assert loop_intersects_loop(lp, lp), name


def test_shared_vertex_nested():
    # b shares vertex 0:0 with a but sits strictly inside a's region
    # (non-collinear edges at the shared vertex).
    a = Loop.from_latlng_text("0:0, 0:20, 20:20, 20:0")
    b = Loop.from_latlng_text("0:0, 5:10, 10:5")
    assert loop_contains_loop(a, b)
    assert not loop_contains_loop(b, a)
    assert loop_intersects_loop(a, b)
    assert loop_intersects_loop(b, a)


def test_union_is_sphere_rejected():
    # near_hemi and far_hemi share all vertices (complements); a hemisphere
    # does NOT contain its complement even though it contains its boundary.
    near, far = L("near_hemi"), L("far_hemi")
    assert not loop_contains_loop(near, far)
    assert not loop_contains_loop(far, near)


def test_normalize_invert():
    import math

    from tests.test_pip import L

    nh = L("north_hemi")
    inv = nh.invert()
    # complement flips containment everywhere
    import numpy as np

    pts = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    for p in pts:
        assert nh.contains_point(p) != inv.contains_point(p)
    # small_necw is a CW ring enclosing most of the sphere -> not normalized
    sn = L("small_necw")
    assert not sn.is_normalized()
    assert sn.normalize().is_normalized()
    assert nh.is_normalized()  # hemisphere counts as normalized
    # invert twice round-trips the vertex ring
    assert np.array_equal(nh.invert().invert().vertices, nh.vertices)
    # empty/full specials
    assert Loop.empty().invert().origin_inside
    assert not Loop.full().invert().origin_inside


def test_canonical_first_vertex():
    import numpy as np

    from tests.test_pip import L

    base = L("candy_cane")
    f0, d0 = base.canonical_first_vertex()
    n = len(base.vertices)

    def canon_seq(lp):
        f, d = lp.canonical_first_vertex()
        m = len(lp.vertices)
        return [tuple(lp.vertices[(f + k * d) % m]) for k in range(m)]

    want = canon_seq(base)
    # rotation-invariant
    for rot in range(1, n):
        assert canon_seq(Loop(np.roll(base.vertices, -rot, axis=0))) == want


def test_polygon_area():
    import math

    from rust_s2_spark.kernel.pip import Polygon

    shell = Loop.from_latlng_text("0:0, 0:30, 30:30, 30:0")
    hole = Loop.from_latlng_text("10:10, 10:20, 20:20, 20:10")
    annulus = Polygon([shell, hole])
    a = annulus.area()
    assert 0 < a < shell.signed_area()
    # Polygon.area sums the robust surface-integral loop areas by depth sign
    assert a == shell.area() - hole.area()
    assert abs(a - (shell.signed_area() - hole.signed_area())) < 1e-12
    # whole-sphere sanity: area of loop + complement = 4*pi
    assert abs(shell.signed_area() + shell.invert().signed_area() - 4 * math.pi) < 1e-9


def test_regular_loop_properties():
    import math

    import numpy as np

    from rust_s2_spark.kernel.pip import loop_contains_loop, regular_loop
    from rust_s2_spark.kernel.region import _latlng_point

    rng = np.random.default_rng(6)
    for _ in range(20):
        lat = math.degrees(math.asin(rng.uniform(-0.95, 0.95)))
        lng = rng.uniform(-180, 180)
        center = _latlng_point(math.radians(lat), math.radians(lng))
        radius = math.radians(rng.uniform(2, 40))
        n = int(rng.integers(3, 24))
        lp = regular_loop(center, radius, n)
        # center is inside; antipode is outside
        assert lp.contains_point(center)
        assert not lp.contains_point(-center)
        # every vertex is exactly radius away from the center
        for v in lp.vertices:
            d = math.atan2(np.linalg.norm(np.cross(center, v)), float(center @ v))
            assert abs(d - radius) < 1e-12
        # CCW orientation: area below hemisphere for radius < pi/2
        assert 0 < lp.signed_area() < 2 * math.pi
        # nested regular loops: smaller radius contained in larger
        inner = regular_loop(center, radius * 0.5, n)
        assert loop_contains_loop(lp, inner)
        # its cap bound contains it and the covering join machinery accepts it
        assert lp.cap_bound().contains_point(center)


def test_shared_vertex_crossing_elsewhere():
    # a and b share vertex 0:0 with non-crossing wedges there, but b's far
    # edge properly crosses a's boundary (bulges outside through the top).
    # Regression: the edge-crossing sweep must run even when a shared vertex
    # was found (loop.rs:978 checks crossings unconditionally).
    a = Loop.from_latlng_text("0:0, 0:20, 20:20, 20:0")
    # contains path: b's wedge at 0:0 is inside a's, but b pokes out the top.
    b = Loop.from_latlng_text("0:0, 5:10, 30:10")
    assert loop_intersects_loop(a, b)
    assert loop_intersects_loop(b, a)
    assert not loop_contains_loop(a, b)
    assert not loop_contains_loop(b, a)
    # intersects path: c's wedge at 0:0 lies outside a (both neighbors below
    # the equator edge) yet its middle lobe crosses straight through a.
    c = Loop.from_latlng_text("0:0, -10:5, 30:10, -10:15")
    assert loop_intersects_loop(a, c)
    assert loop_intersects_loop(c, a)
    assert not loop_contains_loop(a, c)
    assert not loop_contains_loop(c, a)
