"""Loop / Polygon binary encode & decode.

Byte-compatible with the reference's Loop serialization
(loop.rs:1363-1559):

* lossless v1 — version byte (=1), u32-BE vertex count, origin_inside
  byte, then each vertex as three f64-BE coordinates (24 bytes/vertex);
* compressed v1 — version byte (=1), i32-BE snap level, u32-BE vertex
  count, origin_inside byte, then each vertex as the u64-BE CellID of
  its containing cell at the snap level (8 bytes/vertex; lossy — decode
  reconstructs the snapped cell centers).

Polygon framing (no reference counterpart — polygon.rs has no encode):
a codec marker byte (0 = lossless, 1 = compressed) and a u32-BE loop
count, followed by each loop's u32-BE byte length and its loop encoding,
reusing either vertex codec above.  The marker makes the codec
self-describing at decode; the loop codecs themselves must stay
byte-identical to the reference so they cannot carry one — instead both
loop decoders demand EXACT blob length, and the two layouts
(6+24n vs 10+8n bytes) can never coincide: 24a - 8b = 4 has no integer
solution, so a blob of one codec always fails loudly under the other.

All packing/unpacking is vectorized over numpy big-endian views — no
per-vertex Python loops — so these also serve as the row codec for
storing geometry columns as Spark ``binary`` (one blob per row, decoded
batch-wise inside Arrow UDFs).
"""

from __future__ import annotations

import struct

import numpy as np

from . import hierarchy, hilbert
from .pip import Loop, Polygon

_VERSION = 1


def _pack_vertices(vertices: np.ndarray) -> bytes:
    """(n,3) float64 -> big-endian raw bytes, row-major (x,y,z per vertex)."""
    return np.ascontiguousarray(vertices, dtype=">f8").tobytes()


def _unpack_vertices(buf: bytes, n: int, offset: int) -> np.ndarray:
    end = offset + 24 * n
    if len(buf) < end:
        raise ValueError(f"Encoded data too short: expected {end} bytes, found {len(buf)}")
    flat = np.frombuffer(buf, dtype=">f8", count=3 * n, offset=offset)
    return flat.astype(np.float64).reshape(n, 3)


def loop_encode(loop: Loop) -> bytes:
    """Serialize losslessly (loop.rs:1370-1393 layout)."""
    n = len(loop.vertices)
    header = struct.pack(">BIB", _VERSION, n, 1 if loop.origin_inside else 0)
    return header + _pack_vertices(loop.vertices)


def _apply_stored_flag(lp: Loop, origin_inside: bool) -> Loop:
    """Make the stored ``origin_inside`` flag authoritative (as the
    reference's decode does, loop.rs:1445-1462): if it disagrees with the
    recomputed value, the bound — which depends on pole containment and
    hence on the flag — must be re-derived too, or containment prefilters
    would use the complement region's bound."""
    if lp.origin_inside == origin_inside:
        return lp
    lp.origin_inside = origin_inside
    if lp.is_empty_or_full:
        lp.bound = Loop._sentinel_bound(origin_inside)
        lp.subregion_bound = lp.bound
    else:
        lp._init_bound()
    return lp


def loop_decode(data: bytes) -> Loop:
    """Inverse of :func:`loop_encode` (loop.rs:1395-1462).

    As in the reference, the stored ``origin_inside`` flag is
    authoritative — it overrides the recomputed value, so an encoded
    inverted loop round-trips even if its vertex order alone would
    re-derive the complement.
    """
    if len(data) < 6:
        raise ValueError("Encoded data too short")
    version, n, origin_byte = struct.unpack_from(">BIB", data, 0)
    if version != _VERSION:
        raise ValueError(f"Unknown encoding version {version}")
    if len(data) != 6 + 24 * n:
        raise ValueError(
            f"Lossless loop blob must be exactly {6 + 24 * n} bytes, found {len(data)}"
        )
    vertices = _unpack_vertices(data, n, 6)
    return _apply_stored_flag(Loop(vertices), origin_byte != 0)


def loop_encode_compressed(loop: Loop, snap_level: int) -> bytes:
    """Lossy CellID-snapped serialization (loop.rs:1464-1491)."""
    n = len(loop.vertices)
    header = struct.pack(">BiIB", _VERSION, snap_level, n, 1 if loop.origin_inside else 0)
    v = np.asarray(loop.vertices, dtype=float)
    cids = hilbert.cellid_from_xyz(v[:, 0], v[:, 1], v[:, 2])
    snapped = hierarchy.parent(np.atleast_1d(cids).astype(np.uint64), snap_level)
    return header + np.ascontiguousarray(snapped, dtype=">u8").tobytes()


def loop_decode_compressed(data: bytes) -> Loop:
    """Inverse of :func:`loop_encode_compressed` (loop.rs:1493-1558):
    vertices are reconstructed as the snapped cells' center points."""
    if len(data) < 10:
        raise ValueError("Encoded data too short")
    version, _snap_level, n, origin_byte = struct.unpack_from(">BiIB", data, 0)
    if version != _VERSION:
        raise ValueError(f"Unknown encoding version {version}")
    end = 10 + 8 * n
    if len(data) != end:
        raise ValueError(
            f"Compressed loop blob must be exactly {end} bytes, found {len(data)}"
        )
    cids = np.frombuffer(data, dtype=">u8", count=n, offset=10).astype(np.uint64)
    x, y, z = hilbert.cellid_to_xyz(cids)
    return _apply_stored_flag(Loop(np.column_stack([x, y, z])), origin_byte != 0)


def polygon_encode(poly: Polygon, snap_level: int | None = None) -> bytes:
    """Frame a multi-loop Polygon: u32-BE loop count, then per loop a
    u32-BE length prefix and its (lossless or snapped) encoding.  Loop
    depths are not stored — ``polygon_decode`` re-derives the nesting
    hierarchy exactly as ``Polygon.from_loops`` does for fresh input."""
    blobs = [
        loop_encode(lp) if snap_level is None else loop_encode_compressed(lp, snap_level)
        for lp in poly.loops
    ]
    out = [struct.pack(">BI", 0 if snap_level is None else 1, len(blobs))]
    for b in blobs:
        out.append(struct.pack(">I", len(b)))
        out.append(b)
    return b"".join(out)


def polygon_decode(data: bytes, compressed: bool | None = None) -> Polygon:
    """Decode a polygon frame.  The stored codec marker is authoritative;
    passing ``compressed`` asserts the expectation and fails loudly on a
    mismatch instead of mis-parsing vertex bytes."""
    if len(data) < 5:
        raise ValueError("Encoded data too short")
    codec, n_loops = struct.unpack_from(">BI", data, 0)
    if codec not in (0, 1):
        raise ValueError(f"Unknown polygon codec marker {codec}")
    stored_compressed = codec == 1
    if compressed is not None and compressed != stored_compressed:
        raise ValueError(
            f"Codec mismatch: frame stores {'compressed' if stored_compressed else 'lossless'} "
            f"loops but compressed={compressed} was requested"
        )
    offset = 5
    loops = []
    for _ in range(n_loops):
        if len(data) < offset + 4:
            raise ValueError("Encoded data too short")
        (blen,) = struct.unpack_from(">I", data, offset)
        offset += 4
        if len(data) < offset + blen:
            raise ValueError(
                f"Encoded data too short: loop needs {blen} bytes, {len(data) - offset} left"
            )
        blob = data[offset : offset + blen]
        offset += blen
        loops.append(loop_decode_compressed(blob) if stored_compressed else loop_decode(blob))
    return Polygon.from_loops(loops)
