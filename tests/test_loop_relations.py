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
