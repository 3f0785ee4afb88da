"""Edge clipping to cube faces (edge_clipping.rs:55-760).

clip_to_padded_face / face_segments subdivide a geodesic edge at cube-face
boundaries, producing per-face (u, v) segments; edge_intersects_rect and
clip_edge_bound run the exact 2D interval tests against cell uv-rects.
These are the kernels the reference's ShapeIndex construction uses; here
they back exact polygon-covering refinement (an alternative to the
O(n_edges)-per-cell crossing scans) and the per-face segment split of
long polylines before tiling.

Parity notes: the reference source contains two transcription bugs that
this port deliberately does NOT reproduce (the canonical S2 semantics are
implemented instead, matching the reference's own doc comments):
- edge_clipping.rs:80 projects endpoint A twice in the same-face fast
  path (`valid_face_xyz_to_uv(f, &a.0)` for both endpoints);
- edge_clipping.rs:543 clips the x-interval twice in clip_edge_bound
  (second call passes `clip.x` where `clip.y` is meant).
"""

from __future__ import annotations

import math

import numpy as np

from .constants import DBL_EPSILON
from . import stuv

__all__ = [
    "EDGE_CLIP_ERROR_UV_COORD",
    "FACE_CLIP_ERROR_RADIANS",
    "FACE_CLIP_ERROR_UV_COORD",
    "INTERSECT_RECT_ERROR_UV_DIST",
    "clip_to_face",
    "clip_to_padded_face",
    "clip_edge",
    "clip_edge_bound",
    "clipped_edge_bound",
    "edge_intersects_rect",
    "face_segments",
    "interpolate_f64",
]

EDGE_CLIP_ERROR_UV_COORD = 2.25 * DBL_EPSILON
EDGE_CLIP_ERROR_UV_DIST = 2.25 * DBL_EPSILON
FACE_CLIP_ERROR_RADIANS = 3.0 * DBL_EPSILON
FACE_CLIP_ERROR_UV_DIST = 9.0 * DBL_EPSILON
FACE_CLIP_ERROR_UV_COORD = 9.0 * (1.0 / math.sqrt(2.0)) * DBL_EPSILON
INTERSECT_RECT_ERROR_UV_DIST = 3.0 * math.sqrt(2.0) * DBL_EPSILON

AXIS_U, AXIS_V = 0, 1


def _sum_equal(u: float, v: float, w: float) -> bool:
    """Whether u + v == w exactly (edge_clipping.rs:191-193)."""
    return (u + v == w) and (u == w - v) and (v == w - u)


def _intersects_face(n: np.ndarray) -> bool:
    """Whether the line with uvw-normal n intersects the face square
    (|Nu| + |Nv| >= |Nw| evaluated exactly; edge_clipping.rs:215-227)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    return (v >= w - u) and (u >= w - v)


def _intersects_opposite_edges(n: np.ndarray) -> bool:
    """||Nu| - |Nv|| >= |Nw| evaluated exactly (edge_clipping.rs:233-253)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    if abs(u - v) != w:
        return abs(u - v) >= w
    if u >= v:
        return u - w >= v
    return v - w >= u


def _exit_axis(n: np.ndarray) -> int:
    """Axis through which the line with uvw-normal n exits the face
    (edge_clipping.rs:260-290)."""
    if _intersects_opposite_edges(n):
        return AXIS_V if abs(n[0]) >= abs(n[1]) else AXIS_U
    neg = (
        (1 if math.copysign(1.0, n[0]) < 0 else 0)
        ^ (1 if math.copysign(1.0, n[1]) < 0 else 0)
        ^ (1 if math.copysign(1.0, n[2]) < 0 else 0)
    )
    return AXIS_V if neg == 0 else AXIS_U


def _exit_point(n: np.ndarray, axis: int) -> tuple[float, float]:
    """(u, v) where the line with uvw-normal n exits the face
    (edge_clipping.rs:294-315)."""
    if axis == AXIS_U:
        u = 1.0 if n[1] > 0.0 else -1.0
        return u, (-u * n[0] - n[2]) / n[1]
    v = 1.0 if n[0] < 0.0 else -1.0
    return (-v * n[1] - n[2]) / n[0], v


def _uvw(face: int, p: np.ndarray) -> np.ndarray:
    return stuv.face_xyz_to_uvw(face, p)


def clip_to_padded_face(a: np.ndarray, b: np.ndarray, face: int, padding: float = 0.0):
    """(u,v) endpoints of edge AB clipped to [-R,R]^2 of the face
    (R = 1 + padding), or None if AB misses the padded face.

    Derivation differs from the reference's clip_destination scoring
    (edge_clipping.rs:330-399, whose transcription is unreliable — see
    module docstring): the gnomonic projection of the face maps great
    circles to straight lines, so the padded face region is exactly the
    chord set {p : R*(p.w) >= |p.u| and R*(p.w) >= |p.v|} — four
    homogeneous half-spaces.  A Cyrus-Beck parametric clip of the CHORD ab
    against those planes is exact (the chord and the arc project
    identically point-for-point), numerically stable (no division until
    the final projection), and satisfies the documented contract: the
    result is None iff the edge misses the padded square, and returned
    vertices lie in the square on the line AB."""
    af = int(stuv.face(a[0], a[1], a[2]))
    bf = int(stuv.face(b[0], b[1], b[2]))
    if af == face and bf == face and padding == 0.0:
        au, av = (float(x) for x in stuv.valid_face_xyz_to_uv(face, a[0], a[1], a[2]))
        bu, bv = (float(x) for x in stuv.valid_face_xyz_to_uv(face, b[0], b[1], b[2]))
        return (au, av), (bu, bv)
    r = 1.0 + padding
    frame = stuv.FACE_UVW_AXES[face]
    u_ax, v_ax, w_ax = frame[0], frame[1], frame[2]
    planes = (
        r * w_ax - u_ax,
        r * w_ax + u_ax,
        r * w_ax - v_ax,
        r * w_ax + v_ax,
    )
    t0, t1 = 0.0, 1.0
    for pl in planes:
        fa = float(a @ pl)
        fb = float(b @ pl)
        if fa < 0.0 and fb < 0.0:
            return None
        if fa < 0.0:
            t0 = max(t0, fa / (fa - fb))
        elif fb < 0.0:
            t1 = min(t1, fa / (fa - fb))
    if t0 > t1:
        return None
    d = b - a
    pa = a + t0 * d
    pb = a + t1 * d
    wa = float(pa @ w_ax)
    wb = float(pb @ w_ax)
    if wa <= 0.0 or wb <= 0.0:
        return None  # degenerate chord through the origin (antipodal a, b)
    return (
        (float(pa @ u_ax) / wa, float(pa @ v_ax) / wa),
        (float(pb @ u_ax) / wb, float(pb @ v_ax) / wb),
    )


def clip_to_face(a: np.ndarray, b: np.ndarray, face: int):
    return clip_to_padded_face(a, b, face, 0.0)


def interpolate_f64(x: float, a: float, b: float, a1: float, b1: float) -> float:
    """Exact-endpoint interpolation (edge_clipping.rs:554-559)."""
    if abs(a - x) <= abs(b - x):
        return a1 + (b1 - a1) * (x - a) / (b - a)
    return b1 + (a1 - b1) * (x - b) / (a - b)


def _update_endpoint(lo, hi, high_endpoint, value):
    """(lo, hi, ok) with one endpoint tightened (edge_clipping.rs:402-425)."""
    if not high_endpoint:
        if hi < value:
            return lo, hi, False
        if lo < value:
            lo = value
        return lo, hi, True
    if lo > value:
        return lo, hi, False
    if hi > value:
        hi = value
    return lo, hi, True


def _clip_bound_axis(a0, b0, lo0, hi0, a1, b1, lo1, hi1, neg_slope, clip_lo, clip_hi):
    """Clip axis-0 interval to [clip_lo, clip_hi], tightening axis 1
    accordingly (edge_clipping.rs:432-472)."""
    if lo0 < clip_lo:
        if hi0 < clip_lo:
            return lo0, hi0, lo1, hi1, False
        lo0 = clip_lo
        lo1, hi1, ok = _update_endpoint(
            lo1, hi1, neg_slope, interpolate_f64(clip_lo, a0, b0, a1, b1)
        )
        if not ok:
            return lo0, hi0, lo1, hi1, False
    if hi0 > clip_hi:
        if lo0 > clip_hi:
            return lo0, hi0, lo1, hi1, False
        hi0 = clip_hi
        lo1, hi1, ok = _update_endpoint(
            lo1, hi1, not neg_slope, interpolate_f64(clip_hi, a0, b0, a1, b1)
        )
        if not ok:
            return lo0, hi0, lo1, hi1, False
    return lo0, hi0, lo1, hi1, True


def clip_edge_bound(a, b, clip, bound):
    """Bound of AB ∩ clip given a tight bound of AB; rects are
    (x_lo, x_hi, y_lo, y_hi) tuples.  Returns (bound', intersects)
    (edge_clipping.rs:524-547; the reference's second call clips x twice —
    canonical semantics clip y, as here)."""
    neg_slope = (a[0] > b[0]) != (a[1] > b[1])
    x_lo, x_hi, y_lo, y_hi = bound
    x_lo, x_hi, y_lo, y_hi, ok = _clip_bound_axis(
        a[0], b[0], x_lo, x_hi, a[1], b[1], y_lo, y_hi, neg_slope, clip[0], clip[1]
    )
    if not ok:
        return bound, False
    y_lo, y_hi, x_lo, x_hi, ok = _clip_bound_axis(
        a[1], b[1], y_lo, y_hi, a[0], b[0], x_lo, x_hi, neg_slope, clip[2], clip[3]
    )
    return (x_lo, x_hi, y_lo, y_hi), ok


def clipped_edge_bound(a, b, clip):
    """Bound of AB ∩ clip, or None (edge_clipping.rs:503-521)."""
    bound = (
        min(a[0], b[0]),
        max(a[0], b[0]),
        min(a[1], b[1]),
        max(a[1], b[1]),
    )
    out, ok = clip_edge_bound(a, b, clip, bound)
    return out if ok else None


def clip_edge(a, b, clip):
    """(a', b') endpoints of AB ∩ clip, or None (edge_clipping.rs:142-170)."""
    bound = clipped_edge_bound(a, b, clip)
    if bound is None:
        return None
    x_lo, x_hi, y_lo, y_hi = bound
    ai = 1 if a[0] > b[0] else 0
    aj = 1 if a[1] > b[1] else 0

    def vertex(i, j):
        return ((x_hi if i else x_lo), (y_hi if j else y_lo))

    return vertex(ai, aj), vertex(1 - ai, 1 - aj)


def edge_intersects_rect(a, b, rect) -> bool:
    """Whether 2D segment AB intersects the closed rect
    (x_lo, x_hi, y_lo, y_hi) (edge_clipping.rs:475-497)."""
    x_lo, x_hi, y_lo, y_hi = rect
    if (
        max(a[0], b[0]) < x_lo
        or min(a[0], b[0]) > x_hi
        or max(a[1], b[1]) < y_lo
        or min(a[1], b[1]) > y_hi
    ):
        return False
    # All four rect vertices must not lie strictly on one side of line AB.
    nx, ny = -(b[1] - a[1]), b[0] - a[0]
    i = 1 if nx >= 0.0 else 0
    j = 1 if ny >= 0.0 else 0

    def vertex(ii, jj):
        return ((x_hi if ii else x_lo), (y_hi if jj else y_lo))

    vmax = vertex(i, j)
    vmin = vertex(1 - i, 1 - j)
    dmax = nx * (vmax[0] - a[0]) + ny * (vmax[1] - a[1])
    dmin = nx * (vmin[0] - a[0]) + ny * (vmin[1] - a[1])
    return dmax >= 0.0 and dmin <= 0.0


def _move_origin_to_valid_face(face, a, ab, a_uv):
    """edge_clipping.rs:662-717."""
    max_safe = 1.0 - FACE_CLIP_ERROR_UV_COORD
    if max(abs(a_uv[0]), abs(a_uv[1])) <= max_safe:
        return face, a_uv
    n = _uvw(face, ab)
    if _intersects_face(n):
        uv = _exit_point(n, _exit_axis(n))
        exit_xyz = np.array(
            [float(c) for c in stuv.face_uv_to_xyz(face, uv[0], uv[1])]
        )
        abn = ab / np.linalg.norm(ab)
        a_tan = np.cross(abn, a)
        if float((exit_xyz - a) @ a_tan) >= -FACE_CLIP_ERROR_RADIANS:
            return face, a_uv
    if abs(a_uv[0]) >= abs(a_uv[1]):
        face = stuv.uvw_face(face, 0, 1 if a_uv[0] > 0.0 else 0)
    else:
        face = stuv.uvw_face(face, 1, 1 if a_uv[1] > 0.0 else 0)
    au, av = (float(x) for x in stuv.valid_face_xyz_to_uv(face, a[0], a[1], a[2]))
    return face, (max(-1.0, min(1.0, au)), max(-1.0, min(1.0, av)))


def _next_face(face, exit_uv, axis, n, target_face):
    """edge_clipping.rs:720-760."""
    if axis == AXIS_V:
        exit_a, exit_1ma = exit_uv[1], exit_uv[0]
    else:
        exit_a, exit_1ma = exit_uv[0], exit_uv[1]
    exit_a_pos = 1 if exit_a > 0.0 else 0
    exit_1ma_pos = 1 if exit_1ma > 0.0 else 0
    if (
        abs(exit_1ma) == 1.0
        and stuv.uvw_face(face, 1 - axis, exit_1ma_pos) == target_face
        and _sum_equal(exit_uv[0] * n[0], exit_uv[1] * n[1], -n[2])
    ):
        return target_face
    return stuv.uvw_face(face, axis, exit_a_pos)


def face_segments(a: np.ndarray, b: np.ndarray):
    """Subdivide edge AB at cube-face boundaries: list of
    (face, (au, av), (bu, bv)) in order from A to B
    (edge_clipping.rs:582-649)."""
    a_face, a_u, a_v = (t for t in stuv.xyz_to_face_uv(a[0], a[1], a[2]))
    b_face, b_u, b_v = (t for t in stuv.xyz_to_face_uv(b[0], b[1], b[2]))
    a_face, b_face = int(a_face), int(b_face)
    sa = (float(a_u), float(a_v))
    sb = (float(b_u), float(b_v))
    if a_face == b_face:
        return [(a_face, sa, sb)]
    ab = np.cross(a, b)
    a_face, sa = _move_origin_to_valid_face(a_face, a, ab, sa)
    b_face, sb = _move_origin_to_valid_face(b_face, b, -ab, sb)
    segments = []
    b_saved = sb
    face = a_face
    cur_a = sa
    while face != b_face:
        n = _uvw(face, ab)
        axis = _exit_axis(n)
        exit_uv = _exit_point(n, axis)
        segments.append((face, cur_a, exit_uv))
        exit_xyz = np.array(
            [float(c) for c in stuv.face_uv_to_xyz(face, exit_uv[0], exit_uv[1])]
        )
        face = _next_face(face, exit_uv, axis, n, b_face)
        exit_uvw = _uvw(face, exit_xyz)
        cur_a = (float(exit_uvw[0]), float(exit_uvw[1]))
    segments.append((face, cur_a, b_saved))
    return segments
