"""Synthetic interleaved text+media document table + geo extraction.

Input contract (BASELINE.json input_hint / FIXTURES.md F1):

    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Geo spans carry ``text = "<lat>:<lng>"`` in degrees (the reference's own loop
fixture format, loop.rs:2046-2067).

Design notes (100 TB scale):
- Generation is ``spark.range(n) -> mapInPandas``: content is a *pure function
  of the doc index* (splitmix64 hashing, no RNG state), so output is identical
  for any partitioning/parallelism — determinism at two cluster sizes.
- Geo extraction is **pure Catalyst** (``F.filter``/``F.split`` on the span
  array — no Python at all), so it's whole-stage-codegen'd and column-pruned
  down to the one struct field the query needs.
- Span-sequence invariant (kind, text, media_ref, order) is checked via a
  JVM-side sha2 signature per doc (engine-wide, cheap, no Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string, text:string, media_ref:string, offset:int>>"
)

# The 14 exact latlng vectors (cellid.rs:1118-1134) are injected as docs 0-13
# so bit-match against the reference is exercised end-to-end.
_EXACT_VECTORS = [
    (49.703498679, 11.770681595),
    (55.685376759, 12.588490937),
    (45.486546517, -93.449700022),
    (58.299984854, 23.049300056),
    (34.364439040, 108.330699969),
    (-30.694551352, -30.048758753),
    (-25.285264027, 133.823116966),
    (-75.000000031, 0.000000133),
    (-24.694439215, -47.537363213),
    (38.899730392, -99.901813021),
    (81.647200334, -55.631712940),
    (10.050986518, 78.293170610),
    (-34.055420593, 18.551140038),
    (-69.219262171, 49.670072392),
]

# Hot-cluster centers: exercise hot-cell salting (FIXTURES.md F1).
_CITIES = np.array(
    [
        [37.7749, -122.4194],  # SF
        [40.7128, -74.0060],  # NYC
        [35.6762, 139.6503],  # Tokyo
    ]
)

_U = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + _U(0x9E3779B97F4A7C15)
        x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
        return x ^ (x >> _U(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (x >> _U(11)).astype(np.float64) * (2.0**-53)


def doc_latlng(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic lat/lng for doc index: 40% uniform-on-sphere, 60% hot city
    blobs; docs 0-13 pinned to the exact reference vectors."""
    idx = np.asarray(idx, dtype=np.int64)
    h1 = _splitmix64(idx.astype(np.uint64) ^ _U(0xA5A5A5A5A5A5A5A5))
    return _doc_latlng_hashed(idx, h1)


def _doc_latlng_hashed(idx, h1):
    h2 = _splitmix64(h1)
    h3 = _splitmix64(h2)
    u1, u2, u3 = _u01(h1), _u01(h2), _u01(h3)

    # Uniform on sphere (random.rs:35-41 semantics).
    z = 2.0 * u1 - 1.0
    lat_uni = np.degrees(np.arcsin(z))
    lng_uni = 360.0 * u2 - 180.0

    # Hot blobs: tight ±0.25 deg boxes around 3 cities.
    city = (h3 % _U(3)).astype(np.int64)
    lat_blob = _CITIES[city, 0] + (u1 - 0.5) * 0.5
    lng_blob = _CITIES[city, 1] + (u2 - 0.5) * 0.5

    is_blob = u3 < 0.6
    lat = np.where(is_blob, lat_blob, lat_uni)
    lng = np.where(is_blob, lng_blob, lng_uni)

    # Pin docs 0-13 to exact vectors.
    for k, (vlat, vlng) in enumerate(_EXACT_VECTORS):
        lat = np.where(idx == k, vlat, lat)
        lng = np.where(idx == k, vlng, lng)
    return lat, lng


def _gen_batch(idx: np.ndarray) -> pd.DataFrame:
    lat, lng = doc_latlng(idx)
    h = _splitmix64(idx.astype(np.uint64) ^ _U(0x5151515151515151))
    n_extra = (h % _U(3)).astype(np.int64)  # 0-2 extra text spans
    has_media = (_splitmix64(h) % _U(4)) == 0

    doc_ids = np.char.add("doc-", np.char.zfill(idx.astype(str), 12))
    spans_col = []
    for k in range(len(idx)):
        i = int(idx[k])
        spans = [
            {"kind": "text", "text": f"intro {i}", "media_ref": None, "offset": 0},
            {
                "kind": "geo",
                "text": f"{lat[k]:.9f}:{lng[k]:.9f}",
                "media_ref": None,
                "offset": 1,
            },
        ]
        off = 2
        if has_media[k]:
            spans.append(
                {"kind": "media", "text": None, "media_ref": f"media://blob/{i}", "offset": off}
            )
            off += 1
        for t in range(int(n_extra[k])):
            spans.append(
                {"kind": "text", "text": f"body {i} {t}", "media_ref": None, "offset": off}
            )
            off += 1
        spans_col.append(spans)
    return pd.DataFrame({"doc_id": doc_ids, "spans": spans_col})


def synth_docs(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Deterministic interleaved-doc table, generated distributedly."""
    partitions = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"].to_numpy())

    return spark.range(0, n_docs, numPartitions=partitions).mapInPandas(gen, DOC_SCHEMA)


def extract_geo(docs: DataFrame, keep_spans: bool = False) -> DataFrame:
    """doc_id + (lat, lng) from the first geo span — pure Catalyst, no Python.

    Column pruning reaches the scan: only ``spans.kind``/``spans.text`` are read.
    """
    geo_text = F.filter("spans", lambda s: s["kind"] == F.lit("geo"))[0]["text"]
    parts = F.split(geo_text, ":")
    cols = [
        F.col("doc_id"),
        parts[0].cast("double").alias("lat"),
        parts[1].cast("double").alias("lng"),
    ]
    if keep_spans:
        cols.append(F.col("spans"))
    return docs.select(*cols).where(F.col("lat").isNotNull())


def span_signature(docs: DataFrame) -> DataFrame:
    """Per-doc sha2 over the exact (kind, text, media_ref, order) sequence.

    Used as the stage-invariant check (BASELINE.json input_hint): signatures of
    any checkpoint must equal the source's. JVM-side only.
    """
    sig = F.sha2(
        F.array_join(
            F.transform(
                "spans",
                lambda s: F.concat_ws(
                    "\x1f",
                    s["kind"],
                    F.coalesce(s["text"], F.lit("\x00")),
                    F.coalesce(s["media_ref"], F.lit("\x00")),
                    s["offset"].cast("string"),
                ),
            ),
            "\x1e",
        ),
        256,
    )
    return docs.select("doc_id", sig.alias("span_sig"))


def assert_span_invariant(source: DataFrame, checkpoint: DataFrame) -> None:
    """Raise if any doc's span sequence changed between two stages."""
    a = span_signature(source).alias("a")
    b = span_signature(checkpoint).alias("b")
    bad = (
        a.join(b, on="doc_id", how="full")
        .where(F.col("a.span_sig").eqNullSafe(F.col("b.span_sig")) == F.lit(False))
        .count()
    )
    if bad:
        raise AssertionError(f"span-sequence invariant violated for {bad} docs")
