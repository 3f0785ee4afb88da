"""Boolean overlay of spherical loops: union / intersection / difference.

The reference engine has no overlay at all; this builds it on the robust
kernels it does define — ``crossing_sign`` (edge_crosser.rs) to find
crossing edge pairs, ``edge_intersection`` (edge_crossings.rs:159-395) for
the intersection points, and the Loop/Polygon relation algebra for the
no-crossing fast paths.  The construction is Weiler-Atherton on the
sphere:

  1. every A-edge is split at its intersections with B-edges (and vice
     versa), ordered along the edge;
  2. each sub-segment is classified by whether its midpoint lies inside
     the other loop;
  3. segments are selected per operator (union keeps outside-segments,
     intersection keeps inside-segments, difference keeps A-outside plus
     REVERSED B-inside) and stitched into output loops by walking the
     shared intersection nodes.

Degenerate inputs (shared vertices, overlapping collinear edges) are not
supported — ``find_validation_error`` plus a crossing-sign pre-check
reject them — which matches the scope of a v1 overlay; points exactly on
a boundary classify arbitrarily but consistently.
"""

from __future__ import annotations

import numpy as np

from .pip import (
    CROSS,
    EdgeCrosser,
    Loop,
    Polygon,
    edge_intersection,
    loop_contains_loop,
    loop_intersects_loop,
)

__all__ = [
    "loop_overlay",
    "loop_union",
    "loop_intersection",
    "loop_difference",
    "polygon_overlay",
    "polygon_union",
    "polygon_intersection",
    "polygon_difference",
]


def _node_key(p: np.ndarray) -> tuple:
    """Merge key for intersection points (INTERSECTION_MERGE_RADIUS scale)."""
    return tuple(np.round(p, 12))


def _split_chains(a: Loop, b: Loop, crossings) -> dict:
    """For each loop, the vertex chain with intersection points spliced in.

    Returns {'A': [list of (point, key, is_xing)], 'B': [...]}, in loop
    order.  ``crossings`` is {(i, j): point}.
    """
    out = {}
    for name, lp, idx in (("A", a, 0), ("B", b, 1)):
        n = len(lp.vertices)
        per_edge: dict[int, list] = {k: [] for k in range(n)}
        for (i, j), p in crossings.items():
            e = (i, j)[idx]
            v0 = lp.vertex(e)
            v1 = lp.vertex(e + 1)
            # order along the edge by angle from v0 (monotone for < pi edges)
            t = float(np.arctan2(np.linalg.norm(np.cross(v0, p)), v0 @ p))
            per_edge[e].append((t, p))
        chain = []
        for k in range(n):
            v = lp.vertex(k)
            chain.append((v, _node_key(v), False))
            for _, p in sorted(per_edge[k], key=lambda tp: tp[0]):
                chain.append((p, _node_key(p), True))
        out[name] = chain
    return out


def _segments(chain, other: Loop, keep_inside: bool, reverse: bool):
    """Cut the chain at intersection nodes, classify each run of segments by
    its midpoint, keep runs matching ``keep_inside``; optionally reverse."""
    n = len(chain)
    # runs between consecutive crossing nodes (the chain is cyclic)
    xing_pos = [i for i, (_, _, x) in enumerate(chain) if x]
    runs = []
    if not xing_pos:
        runs.append(list(range(n)) + [0])
    else:
        for a_i, b_i in zip(xing_pos, xing_pos[1:] + [xing_pos[0] + n]):
            runs.append([p % n for p in range(a_i, b_i + 1)])
    kept = []
    for run in runs:
        pts = [chain[p][0] for p in run]
        # classify by a midpoint of the first sub-segment (strictly interior
        # to the run, never an intersection node)
        mid = pts[0] + pts[1]
        mid = mid / np.linalg.norm(mid)
        inside = other.contains_point(mid)
        if inside == keep_inside:
            if reverse:
                pts = pts[::-1]
            kept.append([(p, _node_key(p)) for p in pts])
    return kept


def _stitch(pieces) -> list[Loop]:
    """Join open chains end-to-start at shared node keys into closed loops."""
    open_by_start: dict[tuple, list] = {}
    for piece in pieces:
        open_by_start.setdefault(piece[0][1], []).append(piece)
    loops = []
    used = set()
    for piece in pieces:
        if id(piece) in used:
            continue
        cur = piece
        used.add(id(cur))
        verts = [p for p, _ in cur[:-1]]
        end_key = cur[-1][1]
        start_key = cur[0][1]
        guard = 0
        while end_key != start_key:
            nxts = [c for c in open_by_start.get(end_key, []) if id(c) not in used]
            if not nxts:
                raise ValueError("overlay stitch failed: open chain (degenerate input?)")
            nxt = nxts[0]
            used.add(id(nxt))
            verts.extend(p for p, _ in nxt[:-1])
            end_key = nxt[-1][1]
            guard += 1
            if guard > len(pieces):
                raise ValueError("overlay stitch failed: cycle not closing")
        # drop duplicate consecutive vertices (node merge artifacts)
        clean = []
        for v in verts:
            if not clean or not np.array_equal(clean[-1], v):
                clean.append(v)
        if len(clean) >= 3:
            loops.append(Loop(np.array(clean)))
    return loops


def loop_overlay(a: Loop, b: Loop, op: str) -> Polygon:
    """Boolean overlay of two loops: op in {'union', 'intersection',
    'difference'} (difference = A minus B).  Returns a Polygon (possibly
    empty, possibly multiple shells)."""
    if op not in ("union", "intersection", "difference"):
        raise ValueError(f"unknown overlay op: {op}")
    # FULL/EMPTY sentinel loops are not walkable boundaries — short-circuit
    # by boolean algebra (same re-entry concern as polygon_overlay)
    if a.is_full() or b.is_full() or a.is_empty() or b.is_empty():
        def _as_poly(lp: Loop) -> Polygon:
            if lp.is_empty():
                return Polygon([], _nested=True)
            if lp.is_full():
                return Polygon([Loop.full()], _nested=True)
            return Polygon.from_loops([lp])

        return polygon_overlay(_as_poly(a), _as_poly(b), op)
    # find all crossing edge pairs
    crossings = {}
    na, nb = len(a.vertices), len(b.vertices)
    for i in range(na):
        a0, a1 = a.vertex(i), a.vertex(i + 1)
        crosser = EdgeCrosser(a0, a1)
        for j in range(nb):
            if crosser.crossing_sign(b.vertex(j), b.vertex(j + 1)) == CROSS:
                crossings[(i, j)] = edge_intersection(
                    a0, a1, b.vertex(j), b.vertex(j + 1)
                )
    if not crossings:
        # nested or disjoint
        if loop_contains_loop(a, b):
            if op == "union":
                return Polygon.from_loops([a])
            if op == "intersection":
                return Polygon.from_loops([b])
            return Polygon.from_loops([a, b])  # b becomes the hole
        if loop_contains_loop(b, a):
            if op == "union":
                return Polygon.from_loops([b])
            if op == "intersection":
                return Polygon.from_loops([a])
            return Polygon([], _nested=True)
        if not loop_intersects_loop(a, b):
            if op == "union":
                return Polygon.from_loops([a, b])  # two shells
            if op == "intersection":
                return Polygon([], _nested=True)
            return Polygon.from_loops([a])
        # complementary overlap: boundaries disjoint, neither loop nests in
        # the other, yet they intersect.  With disjoint boundaries this
        # forces comp(B) ⊂ A and comp(A) ⊂ B (each complement is connected
        # and cannot cross the other's boundary), i.e. A ∪ B is the FULL
        # sphere and A ∩ B is the band bounded by both circles.  Two 100°
        # caps around antipodal poles are the canonical instance (found by
        # fuzzing — previously misdiagnosed as the degenerate
        # shared-boundary case and rejected).
        shared = any(
            np.array_equal(va, vb) for va in a.vertices for vb in b.vertices
        )
        if not shared and a.contains_point(b.vertices[0]) and b.contains_point(
            a.vertices[0]
        ):
            if op == "union":
                return Polygon([Loop.full()], _nested=True)
            if op == "difference":
                return Polygon.from_loops([b.invert()])  # A − B = comp(B)
            # A ∩ B = A minus comp(B): shell a with hole comp(B)
            return Polygon.from_loops([a, b.invert()])
        raise ValueError("loops share boundary without proper crossings (degenerate)")
    chains = _split_chains(a, b, crossings)
    if op == "union":
        pieces = _segments(chains["A"], b, keep_inside=False, reverse=False)
        pieces += _segments(chains["B"], a, keep_inside=False, reverse=False)
    elif op == "intersection":
        pieces = _segments(chains["A"], b, keep_inside=True, reverse=False)
        pieces += _segments(chains["B"], a, keep_inside=True, reverse=False)
    else:  # difference: A outside B, plus B inside A walked backwards
        pieces = _segments(chains["A"], b, keep_inside=False, reverse=False)
        pieces += _segments(chains["B"], a, keep_inside=True, reverse=True)
    loops = _stitch(pieces)
    return Polygon.from_loops(loops) if loops else Polygon([], _nested=True)


def loop_union(a: Loop, b: Loop) -> Polygon:
    return loop_overlay(a, b, "union")


def loop_intersection(a: Loop, b: Loop) -> Polygon:
    return loop_overlay(a, b, "intersection")


def loop_difference(a: Loop, b: Loop) -> Polygon:
    return loop_overlay(a, b, "difference")


# ---------------------------------------------------------------------------
# Polygon-polygon overlay (multi-loop odd-even operands)
# ---------------------------------------------------------------------------


def _loop_chain(lp: Loop, xpoints: dict[int, list[np.ndarray]]):
    """Vertex chain of ``lp`` with intersection points spliced in, ordered
    along each edge.  ``xpoints``: edge index -> crossing points."""
    chain = []
    n = len(lp.vertices)
    for k in range(n):
        v0 = lp.vertex(k)
        chain.append((v0, _node_key(v0), False))
        pts = xpoints.get(k, [])
        if pts:
            witht = []
            for p in pts:
                t = float(np.arctan2(np.linalg.norm(np.cross(v0, p)), v0 @ p))
                witht.append((t, p))
            for _, p in sorted(witht, key=lambda tp: tp[0]):
                chain.append((p, _node_key(p), True))
    return chain


def _chain_segments(chain, other: Polygon, keep_inside: bool, reverse: bool):
    """Like _segments but classifies against a Polygon region (parity)."""
    n = len(chain)
    xing_pos = [i for i, (_, _, x) in enumerate(chain) if x]
    runs = []
    if not xing_pos:
        runs.append(list(range(n)) + [0])
    else:
        for a_i, b_i in zip(xing_pos, xing_pos[1:] + [xing_pos[0] + n]):
            runs.append([p % n for p in range(a_i, b_i + 1)])
    kept = []
    for run in runs:
        pts = [chain[p][0] for p in run]
        mid = pts[0] + pts[1]
        mid = mid / np.linalg.norm(mid)
        if other.contains_point(mid) == keep_inside:
            if reverse:
                pts = pts[::-1]
            kept.append([(p, _node_key(p)) for p in pts])
    return kept


def polygon_overlay(a: Polygon, b: Polygon, op: str) -> Polygon:
    """Boolean overlay of two polygons with arbitrary loop nesting (odd-even
    regions).

    Boundary pieces must carry the REGION interior on their left for the
    Weiler-Atherton stitch to close, so hole rings (odd depth) are walked
    inverted ("region-oriented"); classification still tests the original
    polygons' odd-even membership.  The stitched output rings are therefore
    interior-left-oriented, which is exactly ``from_oriented_loops``'s input
    convention (holes re-inverted automatically).  Selection rule
    (regularized booleans, uniform across shells and holes): keep A-pieces
    outside B for union / inside B for intersection; B-pieces outside A for
    union, inside A for intersection, inside A REVERSED for difference."""
    if op not in ("union", "intersection", "difference"):
        raise ValueError(f"unknown overlay op: {op}")
    # FULL/EMPTY operands short-circuit by boolean algebra.  The sentinel
    # loops (1-vertex full/empty encodings) are not walkable boundaries and
    # must never reach the chain/selection machinery — a FULL result from
    # this very function can legally re-enter as an operand (review finding:
    # intersecting a FULL overlay result used to keep the sentinel as a
    # ring, producing a structurally invalid polygon).
    if a.is_full() or b.is_full() or a.is_empty() or b.is_empty():
        if op == "union":
            if a.is_full() or b.is_full():
                return Polygon([Loop.full()], _nested=True)
            return b if a.is_empty() else a
        if op == "intersection":
            if a.is_full():
                return b
            if b.is_full():
                return a
            return Polygon([], _nested=True)  # one operand is empty
        # difference: A ∩ comp(B)
        if a.is_empty() or b.is_full():
            return Polygon([], _nested=True)
        if b.is_empty():
            return a
        return b.invert()  # a is FULL: comp(B)
    ro_a = [lp if not lp.is_hole() else lp.invert() for lp in a.loops]
    ro_b = [lp if not lp.is_hole() else lp.invert() for lp in b.loops]
    a_x: dict[int, dict[int, list]] = {i: {} for i in range(len(ro_a))}
    b_x: dict[int, dict[int, list]] = {j: {} for j in range(len(ro_b))}
    for ai, la in enumerate(ro_a):
        na = len(la.vertices)
        for e in range(na):
            a0, a1 = la.vertex(e), la.vertex(e + 1)
            crosser = EdgeCrosser(a0, a1)
            for bj, lb in enumerate(ro_b):
                nb = len(lb.vertices)
                for f in range(nb):
                    if crosser.crossing_sign(lb.vertex(f), lb.vertex(f + 1)) == CROSS:
                        p = edge_intersection(a0, a1, lb.vertex(f), lb.vertex(f + 1))
                        a_x[ai].setdefault(e, []).append(p)
                        b_x[bj].setdefault(f, []).append(p)
    pieces = []
    out_loops: list[Loop] = []
    keep_a_inside = op == "intersection"
    keep_b_inside = op in ("intersection", "difference")
    rev_b = op == "difference"
    for ai, la in enumerate(ro_a):
        if a_x[ai]:
            pieces += _chain_segments(_loop_chain(la, a_x[ai]), b, keep_a_inside, False)
        elif b.contains_point(la.vertex(0)) == keep_a_inside:
            out_loops.append(la)
    for bj, lb in enumerate(ro_b):
        if b_x[bj]:
            pieces += _chain_segments(_loop_chain(lb, b_x[bj]), a, keep_b_inside, rev_b)
        elif a.contains_point(lb.vertex(0)) == keep_b_inside:
            out_loops.append(lb.invert() if rev_b else lb)
    out_loops += _stitch(pieces)
    if not out_loops:
        if op == "union" and a.loops and b.loops:
            # every ring of BOTH operands was dropped for lying inside the
            # other region (no crossings): each polygon's boundary is
            # interior to the other, so the union covers the sphere —
            # returning the empty polygon here silently aliased FULL with
            # EMPTY (same complementary-overlap topology as loop_overlay;
            # intersection and difference fall out correctly from the
            # selection rule, union needs the explicit FULL)
            return Polygon([Loop.full()], _nested=True)
        return Polygon([], _nested=True)
    return Polygon.from_oriented_loops(out_loops)


def polygon_union(a: Polygon, b: Polygon) -> Polygon:
    return polygon_overlay(a, b, "union")


def polygon_intersection(a: Polygon, b: Polygon) -> Polygon:
    return polygon_overlay(a, b, "intersection")


def polygon_difference(a: Polygon, b: Polygon) -> Polygon:
    return polygon_overlay(a, b, "difference")
