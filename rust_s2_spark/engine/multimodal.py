"""Multimodal columns: opaque media refs/bytes + typed metadata extraction.

The container has no image/audio codecs, so the decode step is a
deterministic stand-in (clearly marked), but the Spark-side plumbing is the
real design for scale: media payloads travel as opaque ``binary``/ref
columns, and feature extraction runs in ``mapInPandas`` over Arrow batches —
one Python process per task, vectorized numpy inside, typed output schema so
downstream stages are pure Catalyst.

Real deployment swaps ``_fake_decode`` for a codec call (PIL/ffmpeg); the
schema, partitioning and batch shape stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, media_ref string, width int, height int, n_frames int, brightness double"
)

_U = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + _U(0x9E3779B97F4A7C15)
        x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
        return x ^ (x >> _U(31))


def _fake_decode(doc_id: np.ndarray) -> pd.DataFrame:
    """DETERMINISTIC STAND-IN for a real media decoder.

    Matches the oracle's arithmetic: width/height/frames/brightness are pure
    functions of doc_id (the oracle replicates them in SQL); a real decoder
    would read bytes here instead.
    """
    did = doc_id.astype(np.int64)
    return pd.DataFrame(
        {
            "width": (did * 37 % 1920).astype(np.int32),
            "height": (did * 53 % 1080).astype(np.int32),
            "n_frames": (did % 120).astype(np.int32),
            "brightness": ((did * 7919 % 256) / 255.0),
        }
    )


def decode_media_features(media: DataFrame) -> DataFrame:
    """media(doc_id, media_ref) -> typed features via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = _fake_decode(b["doc_id"].to_numpy())
            out = pd.concat([b[["doc_id", "media_ref"]].reset_index(drop=True), feats], axis=1)
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)
