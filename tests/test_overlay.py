"""Boolean overlay of spherical loops (kernel/overlay.py).

Verification strategy: exact area identities (area(U) + area(I) =
area(A) + area(B); area(A-B) = area(A) - area(I)) plus pointwise
classification equivalence (overlay polygon membership == boolean algebra
of input memberships) on probe grids.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernel.overlay import (
    loop_difference,
    loop_intersection,
    loop_overlay,
    loop_union,
)
from rust_s2_spark.kernel.pip import Loop
from rust_s2_spark.kernel.region import _latlng_point


def L(t):
    return Loop.from_latlng_text(t)


def P(lat, lng):
    return _latlng_point(math.radians(lat), math.radians(lng))


def _check_pair(a: Loop, b: Loop, probes):
    u = loop_union(a, b)
    i = loop_intersection(a, b)
    d = loop_difference(a, b)
    assert abs(u.area() + i.area() - (a.area() + b.area())) < 1e-12
    assert abs(d.area() - (a.area() - i.area())) < 1e-12
    for la, ln in probes:
        p = P(la, ln)
        ia, ib = a.contains_point(p), b.contains_point(p)
        assert u.contains_point(p) == (ia or ib), (la, ln, "union")
        assert i.contains_point(p) == (ia and ib), (la, ln, "intersection")
        assert d.contains_point(p) == (ia and not ib), (la, ln, "difference")
    return u, i, d


GRID = [(la, ln) for la in range(-6, 36, 4) for ln in range(-12, 36, 5)]


def test_corner_overlap():
    a = L("0:0, 0:20, 20:20, 20:0")
    b = L("10:10, 10:30, 30:30, 30:10")
    u, i, d = _check_pair(a, b, GRID)
    assert u.num_loops() == 1 and i.num_loops() == 1 and d.num_loops() == 1
    # intersection of these convex quads approximates the 10..20 square;
    # not exact because lat-parallel quad edges are geodesics, not parallels
    sq = L("10:10, 10:20, 20:20, 20:10")
    assert abs(i.area() - sq.area()) < 1e-3


def test_band_split_two_pieces():
    a = L("0:0, 0:20, 30:20, 30:0")
    b = L("10:-10, 10:30, 20:30, 20:-10")
    u, i, d = _check_pair(a, b, GRID)
    assert d.num_loops() == 2  # the band cuts A into two shells
    assert u.num_loops() == 1


def test_nested_and_disjoint_fast_paths():
    a = L("0:0, 0:30, 30:30, 30:0")
    inner = L("5:5, 5:15, 15:15, 15:5")
    far = L("50:50, 50:60, 60:60, 60:50")
    # nested
    assert loop_union(a, inner).area() == a.area()
    assert loop_intersection(a, inner).area() == inner.area()
    d = loop_difference(a, inner)
    assert abs(d.area() - (a.area() - inner.area())) < 1e-15
    assert [lp.depth for lp in d.loops] == [0, 1]  # hole polygon
    # reversed nesting
    assert loop_difference(inner, a).is_empty()
    # disjoint
    assert loop_union(a, far).num_loops() == 2
    assert loop_intersection(a, far).is_empty()
    assert loop_difference(a, far).area() == a.area()


def test_pentagon_quad_overlay():
    a = L("0:0, -5:12, 3:24, 14:20, 12:4")  # convex-ish pentagon
    b = L("5:10, 5:35, 25:35, 25:10")
    _check_pair(a, b, GRID)


def test_symmetry():
    a = L("0:0, 0:20, 20:20, 20:0")
    b = L("10:10, 10:30, 30:30, 30:10")
    assert abs(loop_union(a, b).area() - loop_union(b, a).area()) < 1e-12
    assert abs(loop_intersection(a, b).area() - loop_intersection(b, a).area()) < 1e-12


def test_unknown_op_rejected():
    a = L("0:0, 0:20, 20:20, 20:0")
    with pytest.raises(ValueError):
        loop_overlay(a, a, "xor")


# ---------------------------------------------------------------------------
# Polygon-polygon overlay (multi-loop odd-even operands)
# ---------------------------------------------------------------------------

from rust_s2_spark.kernel.overlay import (  # noqa: E402
    polygon_difference,
    polygon_intersection,
    polygon_overlay,
    polygon_union,
)
from rust_s2_spark.kernel.pip import Polygon  # noqa: E402

# probe grid deliberately off every fixture boundary coordinate
PGRID = [
    (la, ln)
    for la in np.arange(-4.7, 64, 3.7)
    for ln in np.arange(-4.3, 64, 3.9)
]


def _check_poly_pair(a, b):
    u = polygon_union(a, b)
    i = polygon_intersection(a, b)
    d = polygon_difference(a, b)
    assert abs(u.area() + i.area() - (a.area() + b.area())) < 1e-12
    assert abs(d.area() - (a.area() - i.area())) < 1e-12
    for la, ln in PGRID:
        p = P(la, ln)
        ia, ib = a.contains_point(p), b.contains_point(p)
        assert u.contains_point(p) == (ia or ib), (la, ln, "union")
        assert i.contains_point(p) == (ia and ib), (la, ln, "intersection")
        assert d.contains_point(p) == (ia and not ib), (la, ln, "difference")
    return u, i, d


ANN = ["0:0, 0:40, 40:40, 40:0", "10:10, 10:30, 30:30, 30:10"]


def test_polygon_overlay_annulus_vs_crossing_disk():
    ann = Polygon.from_loops([L(t) for t in ANN])
    disk = Polygon.from_loops([L("5:5, 5:20, 20:20, 20:5")])
    u, i, d = _check_poly_pair(ann, disk)
    assert u.num_loops() == 2  # hole shrinks but survives
    assert d.num_loops() == 2


def test_polygon_overlay_disk_inside_hole():
    ann = Polygon.from_loops([L(t) for t in ANN])
    hole_disk = Polygon.from_loops([L("15:15, 15:25, 25:25, 25:15")])
    u, i, d = _check_poly_pair(ann, hole_disk)
    assert u.num_loops() == 3  # annulus + island in the hole
    assert i.is_empty()
    assert d.num_loops() == 2  # unchanged annulus


def test_polygon_overlay_two_annuli():
    a = Polygon.from_loops([L(t) for t in ANN])
    b = Polygon.from_loops(
        [L("20:20, 20:60, 60:60, 60:20"), L("30:30, 30:50, 50:50, 50:30")]
    )
    _check_poly_pair(a, b)


def test_polygon_overlay_island_operand():
    deep = Polygon.from_loops(
        [L(t) for t in ANN] + [L("15:15, 15:25, 25:25, 25:15")]
    )
    disk = Polygon.from_loops([L("5:5, 5:20, 20:20, 20:5")])
    _check_poly_pair(deep, disk)


def test_polygon_overlay_hole_swallowed():
    ann = Polygon.from_loops([L(t) for t in ANN])
    big = Polygon.from_loops([L("5:5, 5:35, 35:35, 35:5")])  # covers the hole
    u, i, d = _check_poly_pair(ann, big)
    assert u.num_loops() == 1  # hole filled -> plain disk


def test_polygon_overlay_matches_loop_overlay():
    # single-loop operands must agree exactly with the loop-level overlay
    a1 = L("0:0, 0:20, 20:20, 20:0")
    b1 = L("10:10, 10:30, 30:30, 30:10")
    pa, pb = Polygon.from_loops([a1]), Polygon.from_loops([b1])
    for op in ("union", "intersection", "difference"):
        lp = loop_overlay(a1, b1, op)
        pp = polygon_overlay(pa, pb, op)
        assert abs(lp.area() - pp.area()) < 1e-14, op


def test_overlay_fuzz_regular_loops():
    """Randomized loop_overlay fuzz: area identities must hold exactly for
    arbitrary crossing/nested/disjoint regular-loop pairs."""
    import numpy as np

    from rust_s2_spark.kernel.pip import regular_loop

    rng = np.random.default_rng(99)
    checked = 0
    for _ in range(60):
        lat_a, lng_a = rng.uniform(-60, 60), rng.uniform(-150, 150)
        lat_b = lat_a + rng.uniform(-8, 8)
        lng_b = lng_a + rng.uniform(-8, 8)
        ca = P(lat_a, lng_a)
        cb = P(lat_b, lng_b)
        a = regular_loop(ca, math.radians(rng.uniform(1, 7)), int(rng.integers(6, 24)))
        b = regular_loop(cb, math.radians(rng.uniform(1, 7)), int(rng.integers(6, 24)))
        try:
            u = loop_union(a, b)
            i = loop_intersection(a, b)
            d = loop_difference(a, b)
        except ValueError:
            continue  # degenerate shared-boundary case, legitimately rejected
        assert abs(u.area() + i.area() - (a.area() + b.area())) < 1e-10
        assert abs(d.area() - (a.area() - i.area())) < 1e-10
        # spot probes at both centers
        for c, inside_a, inside_b in (
            (ca, a.contains_point(ca), b.contains_point(ca)),
            (cb, a.contains_point(cb), b.contains_point(cb)),
        ):
            assert u.contains_point(c) == (inside_a or inside_b)
            assert i.contains_point(c) == (inside_a and inside_b)
            assert d.contains_point(c) == (inside_a and not inside_b)
        checked += 1
    assert checked >= 50  # nearly all random pairs are non-degenerate


def test_polygon_overlay_fuzz_annuli():
    """Randomized polygon_overlay fuzz over annulus pairs (shell +
    concentric hole): exact area identities for every op."""
    import numpy as np

    from rust_s2_spark.kernel.pip import regular_loop

    rng = np.random.default_rng(7)
    checked = 0
    for _ in range(30):
        lat_a, lng_a = rng.uniform(-50, 50), rng.uniform(-120, 120)
        lat_b = lat_a + rng.uniform(-6, 6)
        lng_b = lng_a + rng.uniform(-6, 6)
        ca, cb = P(lat_a, lng_a), P(lat_b, lng_b)
        ra = rng.uniform(3, 8)
        rb = rng.uniform(3, 8)
        a = Polygon.from_loops(
            [
                regular_loop(ca, math.radians(ra), 12),
                regular_loop(ca, math.radians(ra * 0.4), 10),
            ]
        )
        b = Polygon.from_loops(
            [
                regular_loop(cb, math.radians(rb), 14),
                regular_loop(cb, math.radians(rb * 0.5), 8),
            ]
        )
        try:
            u = polygon_union(a, b)
            i = polygon_intersection(a, b)
            d = polygon_difference(a, b)
        except ValueError:
            continue
        assert abs(u.area() + i.area() - (a.area() + b.area())) < 1e-10
        assert abs(d.area() - (a.area() - i.area())) < 1e-10
        checked += 1
    assert checked >= 25


def test_complementary_overlap_union_is_full():
    """Two 100-degree caps around antipodal poles: boundaries are disjoint
    small circles, NEITHER loop contains the other, yet they intersect —
    the union is the FULL sphere and the intersection is the equatorial
    band bounded by both circles.  Previously misdiagnosed as the
    degenerate shared-boundary case and rejected (and _rect_is_full called
    the is_full PROPERTY, so the branch TypeError'd before even reaching
    the diagnosis).  Found by tools/fuzz_kernel.py big-radius seeds."""
    from rust_s2_spark.kernel.pip import regular_loop

    n, s = np.array([0.0, 0.0, 1.0]), np.array([0.0, 0.0, -1.0])
    a = regular_loop(n, math.radians(100), 32)
    b = regular_loop(s, math.radians(100), 32)
    u, i, d = _check_pair(a, b, [(la, ln) for la in range(-80, 81, 20) for ln in (0, 90)])
    assert u.is_full()
    assert abs(u.area() - 4 * math.pi) < 1e-12
    assert i.num_loops() == 2  # the band has two boundary circles
    # A - B = complement of B (everything not in B is in A here)
    assert abs(d.area() - (4 * math.pi - b.area())) < 1e-12


def test_polygon_union_complementary_overlap_is_full():
    """Same topology at the Polygon level: the per-ring selection rule
    drops every ring of both operands (each lies inside the other region),
    which used to return EMPTY for a union that covers the sphere."""
    from rust_s2_spark.kernel.overlay import (
        polygon_difference,
        polygon_intersection,
        polygon_union,
    )
    from rust_s2_spark.kernel.pip import Polygon, regular_loop

    n, s = np.array([0.0, 0.0, 1.0]), np.array([0.0, 0.0, -1.0])
    A = Polygon.from_loops([regular_loop(n, math.radians(100), 32)])
    B = Polygon.from_loops([regular_loop(s, math.radians(100), 32)])
    u = polygon_union(A, B)
    i = polygon_intersection(A, B)
    d = polygon_difference(A, B)
    assert u.is_full()
    assert abs(u.area() + i.area() - (A.area() + B.area())) < 1e-12
    assert abs(d.area() - (A.area() - i.area())) < 1e-12
    rng = np.random.default_rng(9)
    for _ in range(100):
        p = rng.uniform(-1, 1, 3)
        p /= np.linalg.norm(p)
        ia, ib = A.contains_point(p), B.contains_point(p)
        assert u.contains_point(p) == (ia or ib)
        assert i.contains_point(p) == (ia and ib)
        assert d.contains_point(p) == (ia and not ib)


def test_overlay_consumes_full_and_empty_operands():
    """A FULL result from the overlay can legally re-enter as an operand
    (review finding: the sentinel loop used to reach the ring-selection
    machinery — intersecting a FULL union with a polygon containing the
    sentinel vertex kept the 1-vertex sentinel as a ring and produced a
    structurally invalid polygon).  FULL/EMPTY operands now short-circuit
    by boolean algebra at both API levels."""
    from rust_s2_spark.kernel.overlay import (
        loop_difference,
        loop_intersection,
        loop_union,
        polygon_difference,
        polygon_intersection,
        polygon_union,
    )
    from rust_s2_spark.kernel.pip import Loop, Polygon, regular_loop

    n, s = np.array([0.0, 0.0, 1.0]), np.array([0.0, 0.0, -1.0])
    A = Polygon.from_loops([regular_loop(n, math.radians(100), 32)])
    B = Polygon.from_loops([regular_loop(s, math.radians(100), 32)])
    U = polygon_union(A, B)
    assert U.is_full()
    # C contains the sentinel vertex region around the north pole
    C = Polygon.from_loops([regular_loop(n, math.radians(20), 16)])
    got = polygon_intersection(U, C)
    assert got.validate() is None, got.validate()
    assert abs(got.area() - C.area()) < 1e-12
    assert polygon_intersection(C, U).validate() is None
    # difference against FULL: comp(C), validates, area complement
    dc = polygon_difference(U, C)
    assert dc.validate() is None
    assert abs(dc.area() - (4 * math.pi - C.area())) < 1e-12
    assert polygon_difference(C, U).is_empty()
    assert polygon_union(U, C).is_full()
    # EMPTY operands
    E = Polygon([], _nested=True)
    assert polygon_union(E, C).area() == C.area()
    assert polygon_intersection(E, C).is_empty()
    assert polygon_difference(C, E).area() == C.area()
    assert polygon_difference(E, C).is_empty()
    # Loop-level sentinels route through the same algebra
    lc = regular_loop(n, math.radians(20), 16)
    assert loop_union(Loop.full(), lc).is_full()
    got = loop_intersection(Loop.full(), lc)
    assert got.validate() is None
    assert abs(got.area() - lc.area()) < 1e-12
    d = loop_difference(Loop.full(), lc)
    assert d.validate() is None
    assert abs(d.area() - (4 * math.pi - lc.area())) < 1e-12
    assert loop_union(Loop.empty(), lc).area() == pytest.approx(lc.area(), abs=0)
    assert loop_intersection(Loop.empty(), lc).is_empty()
