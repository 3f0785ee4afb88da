"""Vectorized cube-face coordinate transforms (parity: /root/reference/src/s2/stuv.rs).

All functions operate on numpy arrays (broadcastable) so whole columns of
geometry move through them in one shot inside pandas/Arrow UDFs — no per-row
Python anywhere.

Only the quadratic projection is implemented (stuv.rs:24-38 — the reference
supports no other projection, metric.rs:50).
"""

from __future__ import annotations

import math

import numpy as np

from .constants import MAX_SI_TI, MAX_SIZE

__all__ = [
    "siti_to_st",
    "st_to_siti",
    "st_to_uv",
    "uv_to_st",
    "st_to_ij",
    "ij_to_stmin",
    "face",
    "valid_face_xyz_to_uv",
    "xyz_to_face_uv",
    "face_uv_to_xyz",
    "latlng_to_xyz",
    "xyz_to_latlng",
]


def siti_to_st(si):
    """si/ti integer [0, 2**31] -> s/t in [0,1] (stuv.rs:7-13)."""
    if not isinstance(si, np.ndarray):
        return float(si) / float(MAX_SI_TI)
    return np.asarray(si, dtype=np.float64) / float(MAX_SI_TI)


def st_to_siti(s):
    """s/t -> nearest si/ti integer (stuv.rs:15-22)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s < 0, (s * MAX_SI_TI - 0.5), (s * MAX_SI_TI + 0.5)).astype(np.int64)


def st_to_uv(s):
    """Quadratic projection s in [0,1] -> u in [-1,1] (stuv.rs:24-30)."""
    if not isinstance(s, np.ndarray):
        ss = float(s)
        if ss >= 0.5:
            return (1.0 / 3.0) * (4.0 * ss * ss - 1.0)
        return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - ss) * (1.0 - ss))
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def uv_to_st(u):
    """Inverse quadratic projection u in [-1,1] -> s in [0,1] (stuv.rs:32-38)."""
    if not isinstance(u, np.ndarray):
        uu = float(u)
        if uu >= 0:
            return 0.5 * math.sqrt(1.0 + 3.0 * uu)
        return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * uu)
    u = np.asarray(u, dtype=np.float64)
    # np.where evaluates both branches; mask keeps sqrt args non-negative.
    pos = u >= 0
    return np.where(
        pos,
        0.5 * np.sqrt(1.0 + 3.0 * np.where(pos, u, 0.0)),
        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * np.where(pos, 0.0, u)),
    )


def st_to_ij(s):
    """s in [0,1] -> leaf i in [0, 2**30) with clamping (cellid.rs:800-802)."""
    if not isinstance(s, np.ndarray):
        return min(max(math.floor(MAX_SIZE * float(s)), 0), MAX_SIZE - 1)
    s = np.asarray(s, dtype=np.float64)
    ij = np.floor(MAX_SIZE * s).astype(np.int64)
    return np.clip(ij, 0, MAX_SIZE - 1)


def ij_to_stmin(i):
    """Leaf index -> minimum s of that leaf (cellid.rs:795-797)."""
    if not isinstance(i, np.ndarray):
        return float(i) / float(MAX_SIZE)
    return np.asarray(i, dtype=np.float64) / float(MAX_SIZE)


def face(x, y, z):
    """Cube face 0-5 with the largest |component| (stuv.rs:40-56)."""
    if not isinstance(x, np.ndarray):
        xx, yy, zz = float(x), float(y), float(z)
        ax, ay, az = abs(xx), abs(yy), abs(zz)
        if ax > ay:
            f, comp = (0, xx) if ax > az else (2, zz)
        else:
            f, comp = (1, yy) if ay > az else (2, zz)
        return f + 3 if comp < 0 else f
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    f = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(f, [x, y, z])
    return np.where(comp < 0, f + 3, f).astype(np.int64)


def valid_face_xyz_to_uv(f, x, y, z):
    """(face, xyz) -> (u, v); point must be on the +side of the face (stuv.rs:58-66)."""
    if not (isinstance(f, np.ndarray) or isinstance(x, np.ndarray)):
        # scalar fast path: np.select costs ~60us of broadcasting machinery
        # per call, which dominates pure-Python geometry (coverer, Cell ops)
        ff, xx, yy, zz = int(f), float(x), float(y), float(z)
        if ff == 0:
            return yy / xx, zz / xx
        if ff == 1:
            return -xx / yy, zz / yy
        if ff == 2:
            return -xx / zz, -yy / zz
        if ff == 3:
            return zz / xx, yy / xx
        if ff == 4:
            return zz / yy, -xx / yy
        return -yy / zz, -xx / zz
    f = np.asarray(f, dtype=np.int64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    # np.select evaluates every branch; unselected branches may divide by zero.
    with np.errstate(divide="ignore", invalid="ignore"):
        return _face_uv_select(f, x, y, z)


def _face_uv_select(f, x, y, z):
    u = np.select(
        [f == 0, f == 1, f == 2, f == 3, f == 4],
        [y / x, -x / y, -x / z, z / x, z / y],
        default=-y / z,
    )
    v = np.select(
        [f == 0, f == 1, f == 2, f == 3, f == 4],
        [z / x, z / y, -y / z, y / x, -x / y],
        default=-x / z,
    )
    return u, v


def xyz_to_face_uv(x, y, z):
    """xyz -> (face, u, v) (stuv.rs:70-74)."""
    f = face(x, y, z)
    u, v = valid_face_xyz_to_uv(f, x, y, z)
    return f, u, v


def face_uv_to_xyz(f, u, v):
    """(face, u, v) -> un-normalized xyz (stuv.rs:76-86)."""
    if not (isinstance(f, np.ndarray) or isinstance(u, np.ndarray)):
        ff, uu, vv = int(f), float(u), float(v)
        if ff == 0:
            return 1.0, uu, vv
        if ff == 1:
            return -uu, 1.0, vv
        if ff == 2:
            return -uu, -vv, 1.0
        if ff == 3:
            return -1.0, -vv, -uu
        if ff == 4:
            return vv, -1.0, -uu
        return vv, uu, -1.0
    f = np.asarray(f, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.select([f == 0, f == 1, f == 2, f == 3, f == 4], [one, -u, -u, -one, v], default=v)
    y = np.select([f == 0, f == 1, f == 2, f == 3, f == 4], [u, one, -v, -v, -one], default=u)
    z = np.select([f == 0, f == 1, f == 2, f == 3, f == 4], [v, v, one, -u, -u], default=-one)
    return x, y, z


def latlng_to_xyz(lat_deg, lng_deg):
    """Degrees lat/lng -> unit xyz (latlng.rs:84-95 semantics)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)


def xyz_to_latlng(x, y, z):
    """xyz (any length) -> degrees lat/lng (latlng.rs:70-81 semantics)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lat = np.arctan2(z, np.sqrt(x * x + y * y))
    lng = np.arctan2(y, x)
    return np.degrees(lat), np.degrees(lng)


# Face frame tables (stuv.rs:200-216): per-face orthonormal (u, v, w) axes
# and the neighboring face across each axis direction.
FACE_UVW_AXES = np.array(
    [
        [[0, 1, 0], [0, 0, 1], [1, 0, 0]],
        [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],
        [[0, 0, -1], [0, -1, 0], [-1, 0, 0]],
        [[0, 0, -1], [1, 0, 0], [0, -1, 0]],
        [[0, 1, 0], [1, 0, 0], [0, 0, -1]],
    ],
    dtype=np.float64,
)

FACE_UVW_FACES = np.array(
    [
        [[4, 1], [5, 2], [3, 0]],
        [[0, 3], [5, 2], [4, 1]],
        [[0, 3], [1, 4], [5, 2]],
        [[2, 5], [1, 4], [0, 3]],
        [[2, 5], [3, 0], [1, 4]],
        [[4, 1], [3, 0], [2, 5]],
    ],
    dtype=np.int64,
)


def uvw_axis(face: int, axis: int) -> np.ndarray:
    """Axis vector of the given face frame (stuv.rs:218-220)."""
    return FACE_UVW_AXES[face][axis]


def uvw_face(face: int, axis: int, direction: int) -> int:
    """Face adjacent to the given face along +/-axis (stuv.rs:222-224)."""
    return int(FACE_UVW_FACES[face][axis][direction])


def u_axis(face: int) -> np.ndarray:
    return uvw_axis(face, 0)


def v_axis(face: int) -> np.ndarray:
    return uvw_axis(face, 1)


def unit_norm(face: int) -> np.ndarray:
    return uvw_axis(face, 2)


def face_xyz_to_uvw(face: int, p) -> np.ndarray:
    """Project a point into the (u,v,w) coordinate frame of the face
    (stuv.rs semantics: dot with each frame axis)."""
    return FACE_UVW_AXES[face] @ np.asarray(p, dtype=np.float64)
