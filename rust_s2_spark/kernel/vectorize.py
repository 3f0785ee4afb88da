"""Vector side of raster<->vector: CellUnion -> boundary Polygon.

Vectorization inverts rasterization: given a set of S2 cells (a covering,
a rasterized mask, a tile-level rollup result), produce the spherical
polygon bounding exactly that region.  Method:

  1. denormalize the union to uniform cells at the requested level;
  2. every cell contributes its 4 CCW edges (interior on the left, using
     the Cell decode's uv-rect vertices); an edge is BOUNDARY iff the
     edge-neighbor across it (cellid.rs:336-347) is outside the set —
     cross-face adjacency comes for free from edge_neighbors' wrap logic;
  3. boundary edges stitch end-to-start into closed loops (shared corner
     vertices are exact: both adjacent cells decode the identical uv
     corner), giving interior-left rings — holes arrive clockwise and
     ``Polygon.from_oriented_loops`` re-inverts them.

The stitch is a CANONICAL per-node matching: at every boundary vertex,
incoming edges (processed in ascending start-vertex key order) each take
the most-sharply-LEFT remaining outgoing edge (interior-on-left keeps
corner-touching components on separate rings); the rings are then exactly
the cycles of that matching, each rotated to start at its smallest corner
key.  Node decisions depend only on the edges AT that node — never on
traversal order — so a distributed stitcher that applies the same rule
per node (engine/vectorize_dist.py) reproduces the decomposition
ring-for-ring.

The result satisfies: contains_point(p) == union membership of leaf(p)
for any p not on a cell boundary, and area(polygon) == sum of the cells'
exact areas.
"""

from __future__ import annotations

import numpy as np

from . import hierarchy as h
from . import hilbert, stuv
from .covering import CellUnion
from .pip import Loop, Polygon

__all__ = [
    "cellunion_boundary",
    "batched_cell_corners",
    "match_ins_to_outs",
    "split_at_repeats",
]


def _corner_key(p: np.ndarray) -> tuple:
    return tuple(np.round(p, 14))


def _turn_ccw(prev_pt: np.ndarray, v: np.ndarray, nxt_pt: np.ndarray) -> float:
    """Signed CCW turn angle at vertex ``v`` (tangent plane, outward normal
    v) from the incoming edge prev->v to the outgoing edge v->nxt.  Left
    turns are positive."""
    in_dir = np.cross(np.cross(prev_pt, v), v)
    out_dir = np.cross(np.cross(v, nxt_pt), v)
    s = float(np.dot(v, np.cross(in_dir, out_dir)))
    c = float(np.dot(in_dir, out_dir))
    return float(np.arctan2(s, c))


def batched_cell_corners(ids_arr: np.ndarray, level: int, return_ij: bool = False):
    """Batched Cell.vertex replication for uniform level-``level`` cells:
    (face, corners, border) with corners (n, 4, 3) unit vectors CCW from
    the uv-lo corner and border (n, 4) per-corner face-border flags
    (|u| == 1 or |v| == 1 — exact at the grid extremes: st_to_uv(0) = -1
    and st_to_uv(1) = 1 are closed-form).  ``return_ij=True`` appends the
    (i_lo, j_lo) leaf-grid corners already computed by the decode, so
    callers needing ij geometry (the block-partitioned stitcher) don't
    re-run cellid_to_face_ij_orientation on the same ids.

    The math replicates Cell.vertex() op-for-op (ij_level_to_bound_uv ->
    st_to_uv -> face_uv_to_xyz -> normalize), so corner keys stay
    bit-identical to the scalar path (proven in tests) — this SHARED helper
    is the linchpin of cross-path key matching between the serial stitch
    and engine/vectorize_dist.py."""
    ids_arr = np.asarray(ids_arr, dtype=np.uint64)
    f, i, j, _ = hilbert.cellid_to_face_ij_orientation(ids_arr)
    cell_size = np.int64(h.size_ij(level))
    x_lo = i.astype(np.int64) & -cell_size
    y_lo = j.astype(np.int64) & -cell_size
    u_lo = stuv.st_to_uv(stuv.ij_to_stmin(x_lo))
    u_hi = stuv.st_to_uv(stuv.ij_to_stmin(x_lo + cell_size))
    v_lo = stuv.st_to_uv(stuv.ij_to_stmin(y_lo))
    v_hi = stuv.st_to_uv(stuv.ij_to_stmin(y_lo + cell_size))
    fi = f.astype(np.int64)
    corners, borders = [], []
    for cu_, cv_ in ((u_lo, v_lo), (u_hi, v_lo), (u_hi, v_hi), (u_lo, v_hi)):
        x, y, z = stuv.face_uv_to_xyz(fi, cu_, cv_)
        nn = np.sqrt(x * x + y * y + z * z)
        corners.append(np.stack([x / nn, y / nn, z / nn], axis=-1))
        borders.append((np.abs(cu_) == 1.0) | (np.abs(cv_) == 1.0))
    out = (fi, np.stack(corners, axis=1), np.stack(borders, axis=1))
    return out + (x_lo, y_lo) if return_ij else out


def match_ins_to_outs(node_pt: np.ndarray, ins: list, outs: list) -> list:
    """Canonical in->out pairing at one boundary vertex.

    ``ins``: (sort_key, prev_pt, in_tag) — sort_key is the numeric corner
    key of the edge's START vertex (distinct ins never tie: two directed
    edges cannot share both endpoints).  ``outs``: (next_pt, out_tag).
    Ins are processed in ascending sort_key; each takes the most-sharply-
    LEFT remaining out (interior-on-left keeps corner-touching components
    on separate rings).  Depends only on the edges at this node, never on
    traversal order — the distributed stitcher applies the identical rule.
    """
    pairs = []
    remaining = list(outs)
    for _, prev_pt, in_tag in sorted(ins, key=lambda t: t[0]):
        if len(remaining) == 1:
            k = 0
        else:
            k = max(
                range(len(remaining)),
                key=lambda i2: _turn_ccw(prev_pt, node_pt, remaining[i2][0]),
            )
        pairs.append((in_tag, remaining[k][1]))
        remaining.pop(k)
    return pairs


def split_at_repeats(items: list, keys: list) -> list:
    """Split a closed walk into node-disjoint cycles at PINCH nodes.

    A mask whose parts meet only at a corner (a pinch) yields a boundary
    cycle that visits the pinch vertex twice no matter how the node pairing
    is chosen — but a Loop must not repeat vertices, so the walk is cut
    into the two rings that merely SHARE the pinch.  Pinches of a
    non-self-crossing walk are properly nested (interleaving would force a
    crossing), so a single stack pass suffices.  Works for open walks too:
    the last returned element is the reduced remainder (for chains); for
    closed walks every element is a ring.

    Returns a list of (items_slice, keys_slice) pairs."""
    out = []
    stack_i: list = []
    stack_k: list = []
    pos: dict = {}
    for it, k in zip(items, keys):
        if k in pos:
            i = pos[k]
            ring_i, ring_k = stack_i[i:], stack_k[i:]
            out.append((ring_i, ring_k))
            for kk in ring_k:
                del pos[kk]
            del stack_i[i:]
            del stack_k[i:]
        pos[k] = len(stack_i)
        stack_i.append(it)
        stack_k.append(k)
    out.append((stack_i, stack_k))
    return out


def cellunion_boundary(cu: CellUnion, level: int) -> Polygon:
    """Boundary polygon of the region covered by ``cu``, traced on the
    level-``level`` grid.  ``level`` must be >= the deepest cell in the
    union (denormalize requirement)."""
    flat = CellUnion(list(cu.ids))
    flat.denormalize(level, 1)  # in-place re-expansion to uniform level
    ids = flat.ids
    if not ids:
        return Polygon([], _nested=True)
    # batch the per-cell kernel work (ONE edge_neighbors / decode / corner
    # call over the whole union instead of len(ids) scalar calls — the
    # scalar loop dominated stitch time ~50x on 1.5k-cell masks)
    ids_arr = np.asarray(ids, dtype=np.uint64)
    all_nbrs = np.asarray(h.edge_neighbors(ids_arr), dtype=np.uint64)
    nbr_in = np.isin(all_nbrs, ids_arr)
    _, verts_all, _ = batched_cell_corners(ids_arr, level)
    # boundary edges: (a, b, akey, bkey)
    edges = []
    for idx in range(len(ids)):
        for k in range(4):
            if nbr_in[idx, k]:
                continue
            a, b = verts_all[idx, k], verts_all[idx, (k + 1) & 3]
            edges.append((a, b, _corner_key(a), _corner_key(b)))
    if not edges:
        # a NON-EMPTY uniform-level union with zero boundary edges covers
        # the whole sphere (any proper non-empty subset of the connected
        # level grid has a boundary): the vectorization is the FULL
        # polygon (area 4*pi, contains everything), not the empty one —
        # loop.rs:266-275's full-loop sentinel exists for exactly this
        return Polygon([Loop.full()], _nested=True)
    # canonical per-node matching -> successor permutation
    ins_by_node: dict[tuple, list] = {}
    outs_by_node: dict[tuple, list] = {}
    for ei, (a, b, akey, bkey) in enumerate(edges):
        ins_by_node.setdefault(bkey, []).append((akey, a, ei))
        outs_by_node.setdefault(akey, []).append((b, ei))
    succ = [-1] * len(edges)
    for node_key, ins in ins_by_node.items():
        outs = outs_by_node.get(node_key, [])
        if len(outs) != len(ins):
            raise ValueError("vectorize stitch failed: open boundary chain")
        node_pt = np.array(node_key)
        for in_ei, out_ei in match_ins_to_outs(node_pt, ins, outs):
            succ[in_ei] = out_ei
    # rings = cycles of the matching, each rotated to its smallest key
    visited = [False] * len(edges)
    loops = []
    for i0 in sorted(range(len(edges)), key=lambda ei: (edges[ei][2], edges[ei][3])):
        if visited[i0]:
            continue
        ring, keys = [], []
        ei, guard = i0, 0
        while True:
            visited[ei] = True
            ring.append(edges[ei][0])
            keys.append(edges[ei][2])
            ei = succ[ei]
            guard += 1
            if ei == i0:
                break
            if guard > len(edges):
                raise ValueError("vectorize stitch failed: unbounded chain")
        for ring_part, keys_part in split_at_repeats(ring, keys):
            rot = min(range(len(keys_part)), key=lambda t: keys_part[t])
            loops.append(Loop(np.array(ring_part[rot:] + ring_part[:rot])))
    return Polygon.from_oriented_loops(loops)


def tile_quad_areas(ids: np.ndarray, lvl: int) -> np.ndarray:
    """Exact spherical area of each level-``lvl`` cell: two-triangle fan of
    the 4 unit corners (CCW from the st-lo corner), with the operation order
    mirrored by the engine oracle's SQL fragment (engine/oracles.py) so both engines agree to well
    below the 1e-7 rounding granularity (measured cross-engine drift on the
    full masks: < 1e-12)."""
    f, i, j, _ = h.cellid_to_face_ij_orientation(np.asarray(ids, dtype=np.uint64))
    n = float(1 << lvl)
    shift = 30 - lvl
    ti = (i >> shift).astype(np.float64)
    tj = (j >> shift).astype(np.float64)
    s_lo, s_hi = ti / n, (ti + 1.0) / n
    t_lo, t_hi = tj / n, (tj + 1.0) / n

    def corner(s, t):
        u = np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                     (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)
        v = np.where(t >= 0.5, (4.0 * t * t - 1.0) / 3.0,
                     (1.0 - 4.0 * (1.0 - t) * (1.0 - t)) / 3.0)
        x, y, z = stuv.face_uv_to_xyz(f.astype(np.int64), u, v)
        nn = np.sqrt(1.0 + u * u + v * v)
        return x / nn, y / nn, z / nn

    va = corner(s_lo, t_lo)
    vb = corner(s_hi, t_lo)
    vc = corner(s_hi, t_hi)
    vd = corner(s_lo, t_hi)

    def tri(a, b, c):
        det = (a[0] * (b[1] * c[2] - b[2] * c[1])
               + a[1] * (b[2] * c[0] - b[0] * c[2])
               + a[2] * (b[0] * c[1] - b[1] * c[0]))
        dab = np.clip(a[0] * b[0] + a[1] * b[1] + a[2] * b[2], -1.0, 1.0)
        dbc = np.clip(b[0] * c[0] + b[1] * c[1] + b[2] * c[2], -1.0, 1.0)
        dca = np.clip(c[0] * a[0] + c[1] * a[1] + c[2] * a[2], -1.0, 1.0)
        return 2.0 * np.arctan2(det, 1.0 + dab + dbc + dca)

    return tri(va, vb, vc) + tri(va, vc, vd)
