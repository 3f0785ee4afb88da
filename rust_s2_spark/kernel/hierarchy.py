"""CellID hierarchy bit-ops: level/parent/children/ranges/neighbors/tokens.

Parity: /root/reference/src/s2/cellid.rs:230-299 (validity, level, parents,
children), cellid.rs:442-459 (ranges/contains), cellid.rs:336-439 (neighbors),
cellid.rs:519-632 (stepping/advance/common ancestor), cellid.rs:685-715
(max_tile), cellid.rs:207-227 (tokens), cellid.rs:115-132 (wrap).

All hot-path functions are vectorized uint64 numpy.  The same parent/range
math is also emitted as Spark SQL Column expressions (see engine.tiling) so
Catalyst can codegen tiling without any UDF.
"""

from __future__ import annotations

import numpy as np

from .constants import MAX_LEVEL, MAX_SIZE, NUM_FACES, POS_BITS, WRAP_OFFSET
from . import stuv
from .hilbert import cellid_from_face_ij, cellid_to_face_ij_orientation

_U = np.uint64

__all__ = [
    "lsb",
    "level",
    "is_leaf",
    "is_face",
    "is_valid",
    "parent",
    "immediate_parent",
    "child_position",
    "children",
    "child_begin_at_level",
    "child_end_at_level",
    "range_min",
    "range_max",
    "contains",
    "intersects",
    "next_cell",
    "prev_cell",
    "next_wrap",
    "prev_wrap",
    "advance",
    "advance_wrap",
    "common_ancestor_level",
    "max_tile",
    "size_ij",
    "from_face",
    "from_face_pos_level",
    "from_face_ij_wrap",
    "from_face_ij_same",
    "edge_neighbors",
    "vertex_neighbors",
    "all_neighbors",
    "to_token",
    "from_token",
    "cellid_to_hex",
    "hex_to_cellid",
]


def _u64(cid):
    return np.asarray(cid).astype(np.uint64)


def lsb(cid):
    if not isinstance(cid, np.ndarray):
        # scalar fast path (coverer hot path): skip asarray + errstate; keep
        # np.uint64 so callers' mixed `lsb(x) << _U(2)` arithmetic still works
        c = int(cid)
        return _U(c & -c)
    cid = _u64(cid)
    with np.errstate(over="ignore"):  # ~0 + 1 wraps (benign, correct result)
        return cid & (~cid + _U(1))


def lsb_for_level(lvl) -> np.uint64:
    return _U(1) << (_U(2) * (_U(MAX_LEVEL) - np.asarray(lvl).astype(np.uint64)))


def size_ij(lvl):
    """Edge length in leaf (i,j) units of a cell at ``lvl``."""
    if not isinstance(lvl, np.ndarray):
        return 1 << (MAX_LEVEL - int(lvl))
    return np.int64(1) << (np.int64(MAX_LEVEL) - np.asarray(lvl).astype(np.int64))


def size_st(lvl):
    """Edge length in (s,t) units of a cell at ``lvl`` (cellid.rs:624-627)."""
    if not isinstance(lvl, np.ndarray):
        return float(size_ij(lvl)) / float(MAX_SIZE)
    return size_ij(lvl).astype(np.float64) / float(MAX_SIZE)


def distance_from_begin(cid):
    """Steps from from_face(0).child_begin_at_level(level) to this cell
    (cellid.rs:585-590); vectorized, always non-negative."""
    cid = np.asarray(cid).astype(np.uint64)
    lvl = level(cid)
    return (cid >> (_U(2) * (_U(MAX_LEVEL) - np.asarray(lvl).astype(np.uint64)) + _U(1))).astype(
        np.int64
    )



def _popcount(x):
    x = _u64(x)
    x = x - ((x >> _U(1)) & _U(0x5555555555555555))
    x = (x & _U(0x3333333333333333)) + ((x >> _U(2)) & _U(0x3333333333333333))
    x = (x + (x >> _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):  # SWAR multiply wraps mod 2^64 by design
        return ((x * _U(0x0101010101010101)) >> _U(56)).astype(np.int64)


def level(cid):
    """Level from position of lowest set bit (cellid.rs:245-247)."""
    if not isinstance(cid, np.ndarray):
        c = int(cid)
        return MAX_LEVEL - ((c & -c).bit_length() - 1) // 2
    return MAX_LEVEL - (_popcount(lsb(cid) - _U(1)) >> 1)


def is_leaf(cid):
    return (_u64(cid) & _U(1)) == 1


def is_face(cid):
    return (_u64(cid) & (lsb_for_level(0) - _U(1))) == 0


def is_valid(cid):
    cid = _u64(cid)
    return ((cid >> _U(POS_BITS)) < NUM_FACES) & ((lsb(cid) & _U(0x1555555555555555)) != 0)


def parent(cid, lvl):
    """Ancestor at ``lvl`` (cellid.rs:265-268).  Pure bit math — also available
    as a Spark Column expression in engine.tiling."""
    l = lsb_for_level(lvl)
    return (_u64(cid) & (~(l - _U(1)))) | l


def immediate_parent(cid):
    nl = lsb(cid) << _U(2)
    return (_u64(cid) & (~(nl - _U(1)))) | nl


def child_position(cid, lvl):
    """Hilbert child index (0-3) of the ancestor chain at ``lvl`` (cellid.rs:282-287)."""
    cid = _u64(cid)
    lvl = np.asarray(lvl).astype(np.uint64)
    return ((cid >> (_U(2) * (_U(MAX_LEVEL) - lvl) + _U(1))) & _U(3)).astype(np.int64)


def children(cid):
    """4 children in Hilbert order, shape (..., 4) (cellid.rs:290-299)."""
    cid = _u64(cid)
    l = lsb(cid) >> _U(2)
    first = cid - (l << _U(2)) + l
    step = l << _U(1)
    return np.stack([first, first + step, first + _U(2) * step, first + _U(3) * step], axis=-1)


def child_begin_at_level(cid, lvl):
    cid = _u64(cid)
    return cid - lsb(cid) + lsb_for_level(lvl)


def child_end_at_level(cid, lvl):
    cid = _u64(cid)
    return cid + lsb(cid) + lsb_for_level(lvl)


def range_min(cid):
    return _u64(cid) - (lsb(cid) - _U(1))


def range_max(cid):
    return _u64(cid) + (lsb(cid) - _U(1))


def contains(a, b):
    """a contains b iff b's leaf range is inside a's (cellid.rs:452-455)."""
    return (range_min(a) <= range_min(b)) & (range_max(b) <= range_max(a))


def intersects(a, b):
    return (range_min(b) <= range_max(a)) & (range_max(b) >= range_min(a))


def next_cell(cid):
    cid = _u64(cid)
    return cid + (lsb(cid) << _U(1))


def prev_cell(cid):
    cid = _u64(cid)
    return cid - (lsb(cid) << _U(1))


def advance(cid, steps):
    """Advance along the Hilbert curve at this cell's level, clamped to the
    curve's ends (cellid.rs:614-632)."""
    cid = _u64(cid)
    steps = np.asarray(steps).astype(np.int64)
    lvl = level(cid)
    step_shift = (2 * (MAX_LEVEL - lvl) + 1).astype(np.uint64)
    min_steps = -(cid >> step_shift).astype(np.int64)
    max_steps = ((WRAP_OFFSET + lsb(cid) - cid) >> step_shift).astype(np.int64)
    steps = np.clip(steps, min_steps, max_steps)
    return cid + (steps.astype(np.uint64) << step_shift)


def next_wrap(cid):
    """Next cell along the Hilbert curve, wrapping from the last cell of face 5
    to the first cell of face 0 (cellid.rs:528-537).  Not for child_end
    sentinels."""
    with np.errstate(over="ignore"):
        n = next_cell(cid)
        return np.where(n < _U(WRAP_OFFSET), n, n - _U(WRAP_OFFSET)).astype(np.uint64)


def prev_wrap(cid):
    """Previous cell along the Hilbert curve, wrapping from the first cell of
    face 0 to the last cell of face 5 (cellid.rs:539-548)."""
    with np.errstate(over="ignore"):
        p = prev_cell(cid)  # underflow wraps mod 2**64, exactly wrapping_sub
        return np.where(p < _U(WRAP_OFFSET), p, p + _U(WRAP_OFFSET)).astype(np.uint64)


def advance_wrap(cid, steps):
    """Advance ``steps`` cells along the Hilbert curve at this cell's level,
    wrapping between the first and last faces (cellid.rs:550-579).  Vectorized;
    Rust's truncated ``%`` is replayed with np.fmod (sign of the dividend)."""
    cid = _u64(cid)
    steps = np.asarray(steps).astype(np.int64)
    lvl = np.asarray(level(cid)).astype(np.int64)
    shift = ((2 * (MAX_LEVEL - lvl)) + 1).astype(np.uint64)
    wrap = (_U(WRAP_OFFSET) >> shift).astype(np.int64)
    min_s = -((cid >> shift).astype(np.int64))
    max_s = ((_U(WRAP_OFFSET) - cid) >> shift).astype(np.int64)
    red = np.fmod(steps, wrap)
    s = np.where(steps < min_s, np.where(red < min_s, red + wrap, red), steps)
    red = np.fmod(s, wrap)
    s = np.where(s > max_s, np.where(red > max_s, red - wrap, red), s)
    with np.errstate(over="ignore"):  # negative steps as two's-complement u64
        return (cid + (s.astype(np.uint64) << shift)).astype(np.uint64)


def common_ancestor_level(a, b):
    """Level of lowest common ancestor, -1 if none (cellid.rs:593-609)."""
    a = _u64(a)
    b = _u64(b)
    bits = a ^ b
    bits = np.maximum(bits, lsb(a))
    bits = np.maximum(bits, lsb(b))
    # MSB position via float64 exponent is unsafe >2^53; use bit smearing.
    x = bits.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> _U(s)
    msb_pos = _popcount(x) - 1
    lvl = (60 - msb_pos) >> 1
    return np.where(msb_pos > 60, -1, lvl)


def max_tile(cid, limit):
    """Largest cell with same range_min whose range_max < limit's range_min
    (cellid.rs:685-715).  Vectorized over batches of cells: <=30 fixed rounds."""
    cid = _u64(cid)
    limit = _u64(limit)
    start = range_min(cid)
    limit_min = range_min(limit)
    done = start >= limit_min
    out = np.where(done, limit, cid)

    # Shrink: while range_max >= limit, take first child.
    too_big = (~done) & (range_max(out) >= limit)
    for _ in range(MAX_LEVEL):
        if not np.any(too_big):
            break
        l = lsb(out) >> _U(2)
        first_child = out - (l << _U(2)) + l
        out = np.where(too_big, first_child, out)
        too_big = (~done) & (range_max(out) >= limit)
    shrunk = (~done) & (range_max(cid) >= limit)
    done = done | shrunk

    # Grow: while parent has same start and range_max < limit.
    for _ in range(MAX_LEVEL):
        can_grow = (~done) & (~is_face(out))
        if not np.any(can_grow):
            break
        p = immediate_parent(np.where(can_grow, out, _U(1)))
        ok = can_grow & (range_min(p) == start) & (range_max(p) < limit)
        if not np.any(ok):
            break
        out = np.where(ok, p, out)
    return out


def from_face(face):
    return (np.asarray(face).astype(np.uint64) << _U(POS_BITS)) + lsb_for_level(0)


def from_face_pos_level(face, pos, lvl):
    base = (np.asarray(face).astype(np.uint64) << _U(POS_BITS)) + (
        np.asarray(pos).astype(np.uint64) | _U(1)
    )
    return parent(base, lvl)


def from_face_ij_wrap(f, i, j):
    """(face,i,j) possibly outside [0,MAX_SIZE) -> leaf id on the wrapped face
    (cellid.rs:115-132)."""
    f = np.asarray(f).astype(np.int64)
    i = np.clip(np.asarray(i).astype(np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j).astype(np.int64), -1, MAX_SIZE)
    scale = 1.0 / MAX_SIZE
    limit = np.nextafter(1.0, 2.0)
    u = np.clip(scale * ((i << 1) + 1 - MAX_SIZE), -limit, limit)
    v = np.clip(scale * ((j << 1) + 1 - MAX_SIZE), -limit, limit)
    x, y, z = stuv.face_uv_to_xyz(f, u, v)
    nf, nu, nv = stuv.xyz_to_face_uv(x, y, z)
    return cellid_from_face_ij(nf, stuv.st_to_ij(0.5 * (nu + 1)), stuv.st_to_ij(0.5 * (nv + 1)))


def from_face_ij_same(f, i, j, same_face):
    """Dispatch between direct and wrapped construction (cellid.rs:107-112)."""
    same_face = np.asarray(same_face, dtype=bool)
    i_arr = np.asarray(i).astype(np.int64)
    j_arr = np.asarray(j).astype(np.int64)
    direct = cellid_from_face_ij(
        np.asarray(f).astype(np.int64),
        np.clip(i_arr, 0, MAX_SIZE - 1),
        np.clip(j_arr, 0, MAX_SIZE - 1),
    )
    wrapped = from_face_ij_wrap(f, i_arr, j_arr)
    return np.where(same_face, direct, wrapped)


def edge_neighbors(cid):
    """4 neighbors across cell edges at the same level, shape (..., 4)
    (cellid.rs:336-347)."""
    cid = _u64(cid)
    lvl = level(cid)
    size = size_ij(lvl)
    f, i, j, _ = cellid_to_face_ij_orientation(cid)
    down = parent(from_face_ij_same(f, i, j - size, j - size >= 0), lvl)
    right = parent(from_face_ij_same(f, i + size, j, i + size < MAX_SIZE), lvl)
    up = parent(from_face_ij_same(f, i, j + size, j + size < MAX_SIZE), lvl)
    left = parent(from_face_ij_same(f, i - size, j, i - size >= 0), lvl)
    return np.stack([down, right, up, left], axis=-1)


def vertex_neighbors(cid, lvl):
    """3-4 cells at ``lvl`` sharing the vertex closest to this cell's center
    (cellid.rs:352-379).  Returns (..., 4) with the 4th column possibly a
    duplicate of the 1st when only 3 neighbors exist (caller dedupes)."""
    cid = _u64(cid)
    half = size_ij(lvl + 1)
    size = half << 1
    f, i, j, _ = cellid_to_face_ij_orientation(cid)

    i_hi = (i & half) != 0
    ioffset = np.where(i_hi, size, -size)
    isame = np.where(i_hi, (i + size) < MAX_SIZE, (i - size) >= 0)
    j_hi = (j & half) != 0
    joffset = np.where(j_hi, size, -size)
    jsame = np.where(j_hi, (j + size) < MAX_SIZE, (j - size) >= 0)

    n0 = parent(cid, lvl)
    n1 = parent(from_face_ij_same(f, i + ioffset, j, isame), lvl)
    n2 = parent(from_face_ij_same(f, i, j + joffset, jsame), lvl)
    n3 = parent(from_face_ij_same(f, i + ioffset, j + joffset, isame & jsame), lvl)
    # 4th neighbor exists only if isame or jsame (corner-of-face case).
    n3 = np.where(isame | jsame, n3, n0)
    return np.stack([n0, n1, n2, n3], axis=-1)


def all_neighbors_same_level(cid):
    """Vectorized Moore neighborhood at the cell's OWN level, shape (..., 8).

    Batch twin of ``all_neighbors(cid, level(cid))`` (cellid.rs:389-439 with
    ``nbr_size == size``) for the distance-join candidate generator: the 8
    surrounding same-level cells with cube wrap.  At cube-face corners a
    diagonal slot wraps onto a duplicate of an edge neighbor — exactly the
    values the scalar loop feeds ``np.unique`` — so callers dedupe per row.
    """
    cid = _u64(cid)
    lvl = level(cid)
    size = size_ij(lvl)
    f, i, j, _ = cellid_to_face_ij_orientation(cid)
    i = i & -size
    j = j & -size
    j_lo = j - size >= 0
    j_hi = j + size < MAX_SIZE
    i_lo = i - size >= 0
    i_hi = i + size < MAX_SIZE
    cols = [
        from_face_ij_same(f, i - size, j - size, j_lo & i_lo),
        from_face_ij_same(f, i + size, j - size, j_lo & i_hi),
        from_face_ij_same(f, i, j - size, j_lo),
        from_face_ij_same(f, i, j + size, j_hi),
        from_face_ij_same(f, i - size, j, i_lo),
        from_face_ij_same(f, i + size, j, i_hi),
        from_face_ij_same(f, i - size, j + size, j_hi & i_lo),
        from_face_ij_same(f, i + size, j + size, j_hi & i_hi),
    ]
    return np.stack([parent(c, lvl) for c in cols], axis=-1)


def all_neighbors(cid, lvl):
    """Full Moore neighborhood of one cell at ``lvl >= level(cid)``
    (cellid.rs:389-439).  Scalar helper (used per query region, not per doc):
    returns a sorted unique 1-D array."""
    cid_u = np.uint64(cid)
    f, i, j, _ = (int(v) for v in cellid_to_face_ij_orientation(cid_u))
    own_lvl = int(level(cid_u))
    size = int(size_ij(own_lvl))
    i &= -size
    j &= -size
    nbr_size = int(size_ij(lvl))
    out = []
    k = -nbr_size
    while True:
        if k < 0:
            same_face = j + k >= 0
        elif k >= size:
            same_face = j + k < MAX_SIZE
        else:
            same_face = True
            out.append(parent(from_face_ij_same(f, i + k, j - nbr_size, j - nbr_size >= 0), lvl))
            out.append(parent(from_face_ij_same(f, i + k, j + size, j + size < MAX_SIZE), lvl))
        out.append(
            parent(from_face_ij_same(f, i - nbr_size, j + k, same_face and i - nbr_size >= 0), lvl)
        )
        out.append(
            parent(from_face_ij_same(f, i + size, j + k, same_face and i + size < MAX_SIZE), lvl)
        )
        if k >= size:
            break
        k += nbr_size
    return np.unique(np.array(out, dtype=np.uint64))


# ---------------------------------------------------------------------------
# Token / hex codecs (cellid.rs:207-227) — debug/test surface, not hot path.
# ---------------------------------------------------------------------------


def to_token(cid) -> str:
    cid = int(np.uint64(cid))
    if cid == 0:
        return "X"
    return f"{cid:016x}".rstrip("0")


def from_token(token: str) -> np.uint64:
    if len(token) > 16:
        return np.uint64(0)
    try:
        v = int(token, 16)
    except ValueError:
        return np.uint64(0)
    # Reject tokens int() accepts but S2 does not (sign, whitespace, 0x).
    if not token or any(c not in "0123456789abcdefABCDEF" for c in token):
        return np.uint64(0)
    return np.uint64(v << (4 * (16 - len(token))))


def cellid_to_hex(cid):
    """uint64 array -> 16-char lowercase hex (test/debug)."""
    return np.array([f"{int(v):016x}" for v in np.atleast_1d(_u64(cid))])


def hex_to_cellid(hx):
    """hex strings -> uint64 array."""
    return np.array([np.uint64(int(h, 16)) for h in np.atleast_1d(hx)], dtype=np.uint64)


def to_string(cid) -> str:
    """Debug path form "face/3210..." (cellid.rs:804-812)."""
    u = np.uint64(cid)
    if not bool(is_valid(u)):
        return "Invalid: " + format(int(u), "016x")
    out = [str(int(u >> np.uint64(POS_BITS))), "/"]
    for lvl in range(1, int(level(u)) + 1):
        out.append(str(int(child_position(u, lvl))))
    return "".join(out)


def from_string(s: str) -> np.uint64:
    """Parse "face/3210..." (cellid.rs:186-204); invalid -> 0."""
    if len(s) < 2 or len(s) - 2 > MAX_LEVEL:
        return np.uint64(0)
    if not s[0].isdigit() or int(s[0]) > 5 or s[1] != "/":
        return np.uint64(0)
    cid = from_face(int(s[0]))
    for ch in s[2:]:
        if ch not in "0123":
            return np.uint64(0)
        cid = children(cid)[int(ch)]
    return np.uint64(cid)
