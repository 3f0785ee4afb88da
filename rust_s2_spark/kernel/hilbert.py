"""Vectorized 64-bit Hilbert-curve CellID encode/decode.

Parity: /root/reference/src/s2/cellid.rs:135-154 (from_face_ij),
cellid.rs:303-331 (face_ij_orientation), cellid.rs:916-994 (lookup tables),
cellid.rs:462-482 (face_siti / raw_point), cellid.rs:838-874 (latlng conversions).

Everything here is uint64 numpy; batches of millions of points encode in a few
vectorized passes (8 table-lookup rounds), never per-row Python.  The 1024-entry
lookup tables are built once at import time (pure Python recursion over 4^5
nodes — microseconds) and shipped to executors with the package.
"""

from __future__ import annotations

import numpy as np

from .constants import (
    INVERT_MASK,
    LOOKUP_BITS,
    MAX_LEVEL,
    MAX_SIZE,
    POS_BITS,
    SWAP_MASK,
)
from . import stuv

__all__ = [
    "LOOKUP_POS",
    "LOOKUP_IJ",
    "cellid_from_face_ij",
    "cellid_to_face_ij_orientation",
    "cellid_from_latlng",
    "cellid_to_latlng",
    "cellid_from_xyz",
    "cellid_to_xyz",
    "cellid_center_st",
]

# Hilbert child orderings (cellid.rs:910-914; canonical S2 tables).
IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.uint64
)
POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
POS_TO_ORIENTATION = np.array([SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK], dtype=np.uint64)


def _build_lookup_tables(lookup_bits: int = LOOKUP_BITS):
    """Build the 4^bits*4-entry encode/decode tables (cellid.rs:916-994).

    Parameterized ``lookup_bits``: both the kernel and the pure-Column Spark
    encode (engine/tiling.py) use the canonical 4 bits (8 rounds, LOOKUP_POS
    as one 2 KB binary literal).  A 6-bit/5-round variant was evaluated for
    the Column path and rejected — the 32 KB table literal costs more in plan
    canonicalization than the 3 saved rounds (see engine/tiling.py notes);
    the parameterization remains for table-construction tests.
    """
    size = 1 << (2 * lookup_bits + 2)
    lookup_pos = np.zeros(size, dtype=np.uint64)
    lookup_ij = np.zeros(size, dtype=np.uint64)

    def rec(level, i, j, orig_orientation, pos, orientation):
        if level == lookup_bits:
            ij = (i << lookup_bits) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        r = POS_TO_IJ[orientation]
        for idx in range(4):
            rec(
                level + 1,
                (i << 1) + (int(r[idx]) >> 1),
                (j << 1) + (int(r[idx]) & 1),
                orig_orientation,
                (pos << 2) + idx,
                orientation ^ int(POS_TO_ORIENTATION[idx]),
            )

    for o in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        rec(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup_tables()

_U = np.uint64


def cellid_from_face_ij(face, i, j):
    """(face, i, j) leaf coordinates -> leaf CellID, vectorized.

    Eight rounds of 4-bit Hilbert lookups (cellid.rs:135-154).
    """
    face = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    n = face << _U(POS_BITS - 1)
    bits = face & _U(SWAP_MASK)
    mask = _U((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        bits += ((i >> _U(k * LOOKUP_BITS)) & mask) << _U(LOOKUP_BITS + 2)
        bits += ((j >> _U(k * LOOKUP_BITS)) & mask) << _U(2)
        bits = LOOKUP_POS[bits]
        n |= (bits >> _U(2)) << _U(k * 2 * LOOKUP_BITS)
        bits &= _U(SWAP_MASK | INVERT_MASK)
    return n * _U(2) + _U(1)


def cellid_to_face_ij_orientation(cid):
    """CellID -> (face, i, j, orientation), vectorized (cellid.rs:303-331)."""
    if not isinstance(cid, np.ndarray):
        # scalar fast path in pure-Python ints — Cell construction inside the
        # coverer's candidate expansion is the serial covering-generation
        # bottleneck, and numpy uint64 scalar ops cost ~10x a python int op
        c = int(cid)
        f = c >> POS_BITS
        bits = f & SWAP_MASK
        i = j = 0
        lut = LOOKUP_IJ
        lb = LOOKUP_BITS
        ijmask = (1 << lb) - 1
        for k in range(7, -1, -1):
            nbits = MAX_LEVEL - 7 * lb if k == 7 else lb
            bits += ((c >> (k * 2 * lb + 1)) & ((1 << (2 * nbits)) - 1)) << 2
            bits = int(lut[bits])
            i += (bits >> (lb + 2)) << (k * lb)
            j += ((bits >> 2) & ijmask) << (k * lb)
            bits &= SWAP_MASK | INVERT_MASK
        if (c & -c) & 0x1111111111111110:
            bits ^= SWAP_MASK
        return f, i, j, bits
    cid = np.asarray(cid).astype(np.uint64)
    f = cid >> _U(POS_BITS)
    bits = f & _U(SWAP_MASK)
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        bits += ((cid >> _U(k * 2 * LOOKUP_BITS + 1)) & _U((1 << (2 * nbits)) - 1)) << _U(2)
        bits = LOOKUP_IJ[bits]
        i += (bits >> _U(LOOKUP_BITS + 2)) << _U(k * LOOKUP_BITS)
        j += ((bits >> _U(2)) & _U((1 << LOOKUP_BITS) - 1)) << _U(k * LOOKUP_BITS)
        bits &= _U(SWAP_MASK | INVERT_MASK)
    # Orientation adjustment for non-leaf cells at odd levels (cellid.rs:324-329).
    lsb = cid & (~cid + _U(1))
    adjust = (lsb & _U(0x1111111111111110)) != 0
    orientation = bits ^ np.where(adjust, _U(SWAP_MASK), _U(0))
    return f.astype(np.int64), i.astype(np.int64), j.astype(np.int64), orientation.astype(np.int64)


def cellid_from_xyz(x, y, z):
    """Unit xyz -> leaf CellID (cellid.rs:862-869)."""
    f, u, v = stuv.xyz_to_face_uv(x, y, z)
    i = stuv.st_to_ij(stuv.uv_to_st(u))
    j = stuv.st_to_ij(stuv.uv_to_st(v))
    return cellid_from_face_ij(f, i, j)


def cellid_from_latlng(lat_deg, lng_deg):
    """Degrees lat/lng -> leaf CellID (cellid.rs:856-860 via Point)."""
    x, y, z = stuv.latlng_to_xyz(lat_deg, lng_deg)
    return cellid_from_xyz(x, y, z)


def _face_siti(cid):
    """Center of the cell in (face, si, ti) (cellid.rs:462-472)."""
    cid = np.asarray(cid).astype(np.uint64)
    f, i, j, _ = cellid_to_face_ij_orientation(cid)
    is_leaf = (cid & _U(1)) == 1
    # Non-leaf: center offset depends on Hilbert traversal parity.
    odd = ((i ^ (cid.astype(np.int64) >> 2)) & 1) != 0
    delta = np.where(is_leaf, 1, np.where(odd, 2, 0)).astype(np.int64)
    return f, 2 * i + delta, 2 * j + delta


def cellid_to_xyz(cid):
    """CellID -> unit xyz center (cellid.rs:475-482 raw_point, normalized)."""
    f, si, ti = _face_siti(cid)
    u = stuv.st_to_uv(stuv.siti_to_st(si))
    v = stuv.st_to_uv(stuv.siti_to_st(ti))
    x, y, z = stuv.face_uv_to_xyz(f, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    return x / norm, y / norm, z / norm


def cellid_to_latlng(cid):
    """CellID -> degrees (lat, lng) of the cell center."""
    x, y, z = cellid_to_xyz(cid)
    return stuv.xyz_to_latlng(x, y, z)


def cellid_center_st(cid):
    """CellID -> (s, t) center in face coordinates (cellid.rs:635-642)."""
    f, si, ti = _face_siti(cid)
    return f, stuv.siti_to_st(si), stuv.siti_to_st(ti)


def cellid_center_uv(cid):
    """CellID -> (u, v) center in face coordinates (cellid.rs:644-651)."""
    f, s, t = cellid_center_st(cid)
    return f, stuv.st_to_uv(s), stuv.st_to_uv(t)


def cellid_bound_st(cid):
    """CellID -> (face, s_lo, s_hi, t_lo, t_hi) bound (cellid.rs:653-660)."""
    from . import hierarchy as _h

    cid_u = np.asarray(cid).astype(np.uint64)
    f, s, t = cellid_center_st(cid_u)
    half = 0.5 * _h.size_st(_h.level(cid_u))
    return f, s - half, s + half, t - half, t + half


def cellid_bound_uv(cid):
    """CellID -> (face, u_lo, u_hi, v_lo, v_hi) bound (cellid.rs:662-668)."""
    f, s_lo, s_hi, t_lo, t_hi = cellid_bound_st(cid)
    return f, stuv.st_to_uv(s_lo), stuv.st_to_uv(s_hi), stuv.st_to_uv(t_lo), stuv.st_to_uv(t_hi)


def expanded_by_distance_uv(u_lo, u_hi, v_lo, v_hi, distance_rad: float):
    """Expand a (u,v) face rectangle so it contains all points within
    ``distance_rad`` of it on the sphere (cellid.rs:750-789)."""
    import math

    def expand_endpoint(u, max_v, sin_dist):
        sin_u_shift = sin_dist * math.sqrt((1.0 + u * u + max_v * max_v) / (1.0 + u * u))
        cos_u_shift = math.sqrt(1.0 - sin_u_shift * sin_u_shift)
        return (cos_u_shift * u + sin_u_shift) / (cos_u_shift - sin_u_shift * u)

    max_u = max(abs(u_lo), abs(u_hi))
    max_v = max(abs(v_lo), abs(v_hi))
    sin_dist = math.sin(distance_rad)
    return (
        expand_endpoint(u_lo, max_v, -sin_dist),
        expand_endpoint(u_hi, max_v, sin_dist),
        expand_endpoint(v_lo, max_u, -sin_dist),
        expand_endpoint(v_hi, max_u, sin_dist),
    )
