"""Skew caps for the text-dedup joins (round-2 verdict item 4).

A templated corpus (one hot cluster of identical docs) must NOT produce
quadratic candidate pairs: ngram_jaccard drops stop-grams with df >
specs.NGRAM_DF_CAP, minhash_lsh drops band buckets holding >
specs.LSH_BUCKET_CAP docs.  Normal near-dup pairs must still be found.
The spatial join's salting test (test_spatial_join.py) is the template.
"""

from __future__ import annotations

import pytest

from rust_s2_spark.engine import queries as Q
from rust_s2_spark.engine import specs

pytestmark = pytest.mark.spark

N_HOT = 200  # > both caps: one identical-template cluster
TEMPLATE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def hot_corpus_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hotcorpus")
    rows = []
    # hot cluster: identical text -> identical grams (df = N_HOT) and
    # identical minhash signatures (every band bucket = N_HOT)
    for i in range(N_HOT):
        rows.append((i, TEMPLATE))
    # a genuine near-dup pair: one word differs -> most grams shared, most
    # minhash rows equal -> at least one uncapped band collides
    base = " ".join(f"w{j}x w{j}y w{j}z" for j in range(12))
    rows.append((1000, base))
    rows.append((1001, base.replace("w3x", "w3q", 1)))
    # unique background docs (no pairs expected)
    for i in range(20):
        rows.append((2000 + i, " ".join(f"u{i}a{j}" for j in range(15))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.selectExpr(
        "doc_id", "text", "'en' AS lang", "'synth' AS source", "length(text) AS n_chars"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/documents.parquet")
    return str(root)


def test_ngram_jaccard_stop_gram_cap(spark, hot_corpus_dir):
    out = Q.q_ngram_jaccard(spark, hot_corpus_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    # WITHOUT the cap the hot cluster alone yields C(200,2) = 19900 pairs;
    # the cap drops its (all-stop-gram) index entries entirely
    hot_pairs = [p for p in pairs if p[0] < N_HOT and p[1] < N_HOT]
    assert hot_pairs == []
    # the genuine near-dup pair survives (its grams are rare)
    assert (1000, 1001) in pairs
    # global bound: nothing quadratic leaked through
    assert len(pairs) < 50


def test_minhash_lsh_bucket_cap(spark, hot_corpus_dir):
    out = Q.q_minhash_lsh(spark, hot_corpus_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    hot_pairs = [p for p in pairs if p[0] < N_HOT and p[1] < N_HOT]
    assert hot_pairs == []
    assert (1000, 1001) in pairs
    assert len(pairs) < 50


def test_caps_do_not_change_testdata_results():
    """The caps are calibrated above anything the synthetic corpora produce
    (BENCH.md): max gram df = 25 and max band bucket = 12 at sf0.1, so the
    oracled results at the driver SFs are bit-identical with caps on."""
    assert specs.NGRAM_DF_CAP >= 100
    assert specs.LSH_BUCKET_CAP >= 32
