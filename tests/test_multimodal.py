"""The media header decoder is a REAL parser: it must read dimensions out
of fully valid PNG files (real zlib pixel data, real CRCs) and spec-built
JPEG marker streams it has never seen, skip unrelated segments, survive
garbage, and round-trip the fixture generator's arithmetic spec."""

from __future__ import annotations

import struct
import zlib

import pytest

from rust_s2_spark.engine.multimodal import (
    PNG_MAGIC,
    parse_media_header,
    synth_media_blob,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _real_png(w: int, h: int, color_type: int, channels: int) -> bytes:
    """A COMPLETE valid PNG: real filter-prefixed scanlines, compressed."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(w * channels) for _ in range(h))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _jpeg(segments: list[tuple[int, bytes]]) -> bytes:
    out = b"\xff\xd8"
    for marker, payload in segments:
        out += bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload
    return out + b"\xff\xd9"


def _sof(precision: int, h: int, w: int, ncomp: int) -> bytes:
    comps = b"".join(bytes([c + 1, 0x11, 0]) for c in range(ncomp))
    return struct.pack(">BHHB", precision, h, w, ncomp) + comps


@pytest.mark.parametrize(
    "w,h,color_type,channels",
    [(3, 2, 2, 3), (1, 1, 0, 1), (16, 9, 6, 4), (640, 480, 4, 2)],
)
def test_parse_real_png(w, h, color_type, channels):
    blob = _real_png(w, h, color_type, channels)
    assert parse_media_header(blob) == ("png", w, h, channels, 8)


def test_parse_jpeg_sof0_after_other_segments():
    """The segment walk must SKIP APP0/DQT/DHT/COM by their length fields
    before reaching SOF0."""
    segs = [
        (0xE0, b"JFIF\x00" + bytes(9)),
        (0xDB, bytes(65)),
        (0xC4, bytes(19)),
        (0xFE, b"a comment"),
        (0xC0, _sof(8, 1080, 1920, 3)),
    ]
    assert parse_media_header(_jpeg(segs)) == ("jpeg", 1920, 1080, 3, 8)


def test_parse_jpeg_progressive_and_grayscale():
    assert parse_media_header(_jpeg([(0xC2, _sof(8, 33, 44, 1))])) == (
        "jpeg",
        44,
        33,
        1,
        8,
    )
    # 12-bit extended sequential (SOF1)
    assert parse_media_header(_jpeg([(0xC1, _sof(12, 5, 7, 3))])) == (
        "jpeg",
        7,
        5,
        3,
        12,
    )


def test_parse_jpeg_fill_bytes():
    """0xFF fill bytes between segments are legal and must be consumed."""
    body = b"\xff\xd8" + b"\xff\xff\xff" + bytes([0xFF, 0xC0]) + struct.pack(
        ">H", len(_sof(8, 2, 4, 3)) + 2
    ) + _sof(8, 2, 4, 3) + b"\xff\xd9"
    assert parse_media_header(body) == ("jpeg", 4, 2, 3, 8)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"\x00" * 40,
        PNG_MAGIC,  # signature only, no IHDR
        PNG_MAGIC + b"\x00\x00\x00\x0dIHDR",  # truncated IHDR
        b"\xff\xd8",  # SOI only
        b"\xff\xd8\xff\xdb\x00\x01",  # segment length < 2 (malformed)
        b"\xff\xd8" + bytes(20),  # non-marker bytes after SOI
        b"GIF89a" + bytes(20),  # unsupported format
    ],
)
def test_parse_garbage_degrades(blob):
    assert parse_media_header(blob) == ("unknown", 0, 0, 0, 0)


def test_synth_blobs_roundtrip_spec():
    """parse(synth(doc_id)) recovers the arithmetic spec the oracle replays
    — and the structural byte lengths are the documented constants."""
    for d in list(range(0, 40)) + [1919, 1920, 9999, 123456]:
        blob = synth_media_blob(d)
        fmt, w, h, nc, depth = parse_media_header(blob)
        assert fmt == ("png" if d % 2 == 0 else "jpeg")
        assert w == d * 37 % 1920 + 1
        assert h == d * 53 % 1080 + 1
        assert nc == 3 and depth == 8
        assert len(blob) == (65 if d % 2 == 0 else 47)
