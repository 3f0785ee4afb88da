"""Edge distances & geodesic interpolation — the kNN kernel.

Parity: /root/reference/src/s2/edgeutil.rs:120-332 (interpolate, project,
update_min_distance / interior_dist, update_max_distance,
distance_from_segment).  All functions are vectorized over a batch of query
points X (shape (n,3)) against one edge AB — the engine broadcasts edges and
streams point batches through Arrow, so the inner loop is pure numpy.

ChordAngle convention: squared chord length in [0,4] (chordangle.rs:43-57);
STRAIGHT = 4, RIGHT = 2.
"""

from __future__ import annotations

import numpy as np

DBL_EPSILON = 2.220446049250313e-16
STRAIGHT = 4.0
RIGHT = 2.0

__all__ = [
    "interpolate",
    "interpolate_at_distance",
    "project",
    "distance_from_segment",
    "update_min_distance",
    "update_max_distance",
    "closest_point_on_segment",
    "chord2_point_to_edge",
    "max_chord2_point_to_edge",
]


def _norm(v: np.ndarray) -> np.ndarray:
    return np.sqrt(np.sum(v * v, axis=-1))


def interpolate_at_distance(ax_rad: float, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Point along AB at angular distance ``ax_rad`` from A (edgeutil.rs:133-149)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    normal = np.cross(a, b)
    tangent = np.cross(normal, a)
    v = a * np.cos(ax_rad) + tangent * (np.sin(ax_rad) / _norm(tangent))
    return v / _norm(v)


def interpolate(t: float, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Point at fraction ``t`` of the geodesic AB (edgeutil.rs:120-130)."""
    if t == 0.0:
        return np.asarray(a, dtype=np.float64)
    if t == 1.0:
        return np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    ab = np.arctan2(_norm(np.cross(a, b)), np.dot(a, b))
    return interpolate_at_distance(t * ab, a, b)


def _sign(a, b, c) -> np.ndarray:
    """Simple CCW sign (predicates.rs:88-100), batch-friendly."""
    return np.einsum("...i,...i->...", np.cross(a, b), c) > 0


def project(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Closest point(s) on edge AB to X (edgeutil.rs:157-172); x: (n,3) or (3,)."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    axb = np.cross(a, b)
    n2 = float(np.dot(axb, axb))
    p = x - np.outer(x @ axb, axb / n2)
    on_edge = _sign(axb, a, p) & _sign(p, b, axb)
    pn = p / _norm(p)[:, None]
    xa2 = np.sum((x - a) ** 2, axis=1)
    xb2 = np.sum((x - b) ** 2, axis=1)
    nearest = np.where((xa2 <= xb2)[:, None], a, b)
    out = np.where(on_edge[:, None], pn, nearest)
    return out


def _interior_dist(x, a, b):
    """(chord2, is_interior) for batch x vs edge ab (edgeutil.rs:233-332,
    always_update semantics)."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    xa2 = np.sum((x - a) ** 2, axis=1)
    xb2 = np.sum((x - b) ** 2, axis=1)
    ab2 = float(np.sum((a - b) ** 2))
    max_error = 4.75 * DBL_EPSILON * (xa2 + xb2 + ab2) + 8.0 * DBL_EPSILON**2
    maybe_interior = np.abs(xa2 - xb2) < ab2 + max_error

    c = np.cross(a, b)
    c2 = float(np.dot(c, c))
    if c2 == 0.0:  # degenerate edge A == B
        return np.zeros(len(x)), np.zeros(len(x), dtype=bool), xa2, xb2
    x_dot_c = x @ c
    x_dot_c2 = x_dot_c * x_dot_c

    cx = np.cross(np.broadcast_to(c, x.shape), x)
    interior = (
        maybe_interior
        & (np.einsum("ij,ij->i", a - x, cx) < 0)
        & (np.einsum("ij,ij->i", b - x, cx) > 0)
    )
    with np.errstate(invalid="ignore"):
        qr = 1.0 - np.sqrt(np.einsum("ij,ij->i", cx, cx) / c2)
    dist = x_dot_c2 / c2 + qr * qr
    return dist, interior, xa2, xb2


def chord2_point_to_edge(x, a, b) -> np.ndarray:
    """Squared chord distance from each X to segment AB (distance_from_segment
    semantics, edgeutil.rs:224-227); handles A == B."""
    dist, interior, xa2, xb2 = _interior_dist(x, a, b)
    endpoint = np.minimum(np.minimum(xa2, xb2), STRAIGHT)
    return np.where(interior, dist, endpoint)


def distance_from_segment(x, a, b) -> np.ndarray:
    """Angle (radians) from X to segment AB (edgeutil.rs:224-227)."""
    c2 = np.minimum(chord2_point_to_edge(x, a, b), STRAIGHT)
    return 2.0 * np.arcsin(0.5 * np.sqrt(c2))


def update_min_distance(x, a, b, min_dist2: float):
    """(dist2, updated) — vectorized (edgeutil.rs:177-196 semantics)."""
    d = chord2_point_to_edge(x, a, b)
    upd = d < min_dist2
    return np.where(upd, d, min_dist2), upd


def closest_point_on_segment(x, a, b) -> np.ndarray:
    return project(x, a, b)


def max_chord2_point_to_edge(x, a, b) -> np.ndarray:
    """Max squared-chord distance from X to AB via the antipodal trick
    (edgeutil.rs:202-218)."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    xa2 = np.minimum(np.sum((x - a) ** 2, axis=1), STRAIGHT)
    xb2 = np.minimum(np.sum((x - b) ** 2, axis=1), STRAIGHT)
    dist = np.maximum(xa2, xb2)
    over = dist > RIGHT
    if np.any(over):
        anti = chord2_point_to_edge(-x[over], a, b)
        dist[over] = STRAIGHT - anti
    return dist
