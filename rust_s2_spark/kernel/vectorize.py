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

__all__ = ["cellunion_boundary"]


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
    # scalar loop dominated stitch time ~50x on 1.5k-cell masks).  The
    # corner math replicates Cell.vertex() op-for-op (ij_level_to_bound_uv
    # -> st_to_uv -> face_uv_to_xyz -> normalize), so corner keys stay
    # bit-identical to the scalar path (proven in tests).
    ids_arr = np.asarray(ids, dtype=np.uint64)
    all_nbrs = np.asarray(h.edge_neighbors(ids_arr), dtype=np.uint64)
    nbr_in = np.isin(all_nbrs, ids_arr)
    f, i, j, _ = hilbert.cellid_to_face_ij_orientation(ids_arr)
    cell_size = np.int64(h.size_ij(level))
    x_lo = i.astype(np.int64) & -cell_size
    y_lo = j.astype(np.int64) & -cell_size
    u_lo = stuv.st_to_uv(stuv.ij_to_stmin(x_lo))
    u_hi = stuv.st_to_uv(stuv.ij_to_stmin(x_lo + cell_size))
    v_lo = stuv.st_to_uv(stuv.ij_to_stmin(y_lo))
    v_hi = stuv.st_to_uv(stuv.ij_to_stmin(y_lo + cell_size))
    fi = f.astype(np.int64)
    corners = []
    for cu_, cv_ in ((u_lo, v_lo), (u_hi, v_lo), (u_hi, v_hi), (u_lo, v_hi)):
        x, y, z = stuv.face_uv_to_xyz(fi, cu_, cv_)
        nn = np.sqrt(x * x + y * y + z * z)
        corners.append(np.stack([x / nn, y / nn, z / nn], axis=-1))
    verts_all = np.stack(corners, axis=1)  # (n, 4, 3) CCW from the uv-lo corner
    edges: dict[tuple, list] = {}
    for idx in range(len(ids)):
        for k in range(4):
            if nbr_in[idx, k]:
                continue
            a, b = verts_all[idx, k], verts_all[idx, (k + 1) & 3]
            edges.setdefault(_corner_key(a), []).append((a, b))
    loops = []
    used = set()
    for start_key, outs in edges.items():
        for first in outs:
            eid = id(first)
            if eid in used:
                continue
            used.add(eid)
            ring = [first[0]]
            prev_pt = first[0]
            cur_end = first[1]
            guard = 0
            while _corner_key(cur_end) != _corner_key(ring[0]):
                ring.append(cur_end)
                nxts = [
                    e for e in edges.get(_corner_key(cur_end), []) if id(e) not in used
                ]
                if not nxts:
                    raise ValueError("vectorize stitch failed: open boundary chain")
                if len(nxts) == 1:
                    nxt = nxts[0]
                else:
                    # corner-touch node (e.g. two cells of the set meeting
                    # only diagonally): several outgoing boundary edges.
                    # Keep each face on its own ring by taking the
                    # continuation that turns most sharply LEFT of the
                    # incoming edge (interior-on-left convention) — picking
                    # arbitrarily can merge two rings into a self-touching
                    # figure-8.
                    nxt = max(nxts, key=lambda e: _turn_ccw(prev_pt, cur_end, e[1]))
                used.add(id(nxt))
                prev_pt = cur_end
                cur_end = nxt[1]
                guard += 1
                if guard > 4 * len(ids) + 8:
                    raise ValueError("vectorize stitch failed: unbounded chain")
            loops.append(Loop(np.array(ring)))
    return Polygon.from_oriented_loops(loops)
