"""Spherical polyline/loop simplification (Douglas-Peucker on geodesics).

Coastline-scale polygons are the expensive inputs for covering generation
and PIP joins; simplifying them within an angular tolerance before
indexing is the standard preprocessing step.  The kernel is classic
Douglas-Peucker with the spherical point-to-geodesic-segment distance
(kernel/edgeutil.py, edgeutil.rs:224-227):

  - every retained vertex is an original vertex (no new geometry);
  - every dropped vertex lies within ``tolerance`` radians of the
    simplified boundary;
  - loops are seeded with the diameter pair (v0 and the vertex farthest
    from v0) so the recursion never collapses a ring to a degenerate
    2-point chain.
"""

from __future__ import annotations

import numpy as np

from . import edgeutil
from .pip import Loop

__all__ = ["simplify_points", "simplify_loop"]


def _dp(points: np.ndarray, first: int, last: int, tol: float, keep: np.ndarray) -> None:
    """Mark kept indices between fixed endpoints first < last (iterative
    stack — coastline rings recurse deeper than Python's limit)."""
    stack = [(first, last)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        interior = points[lo + 1 : hi]
        d = edgeutil.distance_from_segment(interior, points[lo], points[hi])
        k = int(np.argmax(d))
        if float(d[k]) > tol:
            mid = lo + 1 + k
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))


def simplify_points(points: np.ndarray, tolerance_rad: float) -> np.ndarray:
    """Open polyline: indices of retained vertices (endpoints always kept)."""
    n = len(points)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    _dp(points, 0, n - 1, tolerance_rad, keep)
    return np.nonzero(keep)[0]


def simplify_loop(lp: Loop, tolerance_rad: float) -> Loop:
    """Simplified loop: every dropped vertex is within ``tolerance_rad`` of
    the result's boundary.  Raises if simplification would collapse the
    ring below 3 vertices."""
    pts = lp.vertices
    n = len(pts)
    if n <= 4:
        return lp
    # seed with the diameter pair: v0 and the vertex farthest from v0
    dots = pts @ pts[0]
    far = int(np.argmin(dots))
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[far] = True
    _dp(pts, 0, far, tolerance_rad, keep)
    # wrap-around arc far..n..0: operate on the rolled copy
    rolled = np.vstack([pts[far:], pts[: 1]])
    rkeep = np.zeros(len(rolled), dtype=bool)
    rkeep[0] = rkeep[-1] = True
    _dp(rolled, 0, len(rolled) - 1, tolerance_rad, rkeep)
    for i in np.nonzero(rkeep[:-1])[0]:
        keep[(far + int(i)) % n] = True
    idx = np.nonzero(keep)[0]
    if len(idx) < 3:
        raise ValueError("simplification collapsed the loop below 3 vertices")
    return Loop(pts[idx].copy())
