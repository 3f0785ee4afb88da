"""Hot-cell skew evidence: with HALF the corpus in ONE level-12 cell, the
unsalted shuffle covering-join concentrates that half into a single reduce
partition (the straggler), while the salted variant splits the hot cell
across salt buckets and bounds the largest partition — with bit-identical
join output.  Partition ROW COUNTS are the measured quantity: they are the
deterministic driver of reduce-task time (the refine work above the
shuffle is per-row), where wall-clock task times would flake."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rust_s2_spark.engine.join import covering_join
from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert

N = 40_000
HOT_FRAC = 0.5
LEVELS = [6, 12]
SALT = 16


@pytest.fixture()
def skew_fixture(spark):
    rng = np.random.default_rng(42)
    n_hot = int(N * HOT_FRAC)
    lat = np.concatenate([np.full(n_hot, 48.8566), rng.uniform(-80.0, 80.0, N - n_hot)])
    lng = np.concatenate([np.full(n_hot, 2.3522), rng.uniform(-180.0, 180.0, N - n_hot)])
    leaf = np.asarray(hilbert.cellid_from_latlng(lat, lng), dtype=np.uint64)
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": np.arange(N, dtype=np.int64),
                "cell_id": leaf.view(np.int64),
            }
        )
    ).repartition(8, "doc_id")
    hot12 = int(np.int64(h.parent(leaf[0], 12)))
    hot6 = int(np.int64(h.parent(leaf[0], 6)))
    # covering: the hot level-12 cell + 30 uniform level-6 cells (excluding
    # the hot cell's own level-6 ancestor so every doc matches at most once)
    l6 = np.unique(h.parent(leaf[n_hot:], 6))
    cells6 = [int(np.int64(c)) for c in l6 if int(np.int64(c)) != hot6][:30]
    rows = [("hot", hot12, 12, 0, 0)] + [("r6", c, 6, 0, 0) for c in cells6]
    coverings = spark.createDataFrame(
        rows,
        "region_id string, cover_cell long, cover_level int, range_min long, range_max long",
    )
    return docs, coverings, n_hot


def _part_shares(df) -> list[float]:
    counts = [
        r["c"]
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    tot = sum(counts)
    return sorted((c / tot for c in counts), reverse=True)


def test_salted_covering_join_bounds_skew(spark, skew_fixture):
    docs, coverings, n_hot = skew_fixture
    keys = ("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions")
    old = {k: spark.conf.get(k) for k in keys}
    # force the shuffle (sort-merge) path and freeze partitioning: AQE's own
    # skew splitting must not mask what the salt does
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        plain = covering_join(
            docs, coverings, broadcast_regions=False, levels=LEVELS
        ).select("doc_id", "region_id", "cover_cell")
        salted = covering_join(
            docs,
            coverings,
            broadcast_regions=False,
            salt=SALT,
            id_col="doc_id",
            levels=LEVELS,
        ).select("doc_id", "region_id", "cover_cell")

        a = sorted(map(tuple, plain.collect()))
        b = sorted(map(tuple, salted.collect()))
        assert a == b, "salting changed the join output"
        assert len(a) >= n_hot  # every hot doc matched the hot cell

        p_shares = _part_shares(plain)
        s_shares = _part_shares(salted)
        # unsalted: the hot cell's partition holds >= the hot half of the
        # output — the straggler a 1000-executor cluster would wait on
        assert p_shares[0] >= 0.45, f"fixture lost its skew: {p_shares[:3]}"
        # salted: the hot cell spreads over SALT buckets; even with a few
        # bucket->partition collisions the max partition is bounded
        assert s_shares[0] <= 3.0 / SALT, f"salt did not bound skew: {s_shares[:3]}"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
