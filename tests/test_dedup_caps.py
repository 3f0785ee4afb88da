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


def _banded_brute_force(sigs: dict[int, int], k: int) -> set[tuple[int, int, int]]:
    """Independent Python replica of the banded-simhash contract: all pairs
    with hamming <= k that share at least one band bucket surviving the
    LSH_BUCKET_CAP drop (pigeonhole guarantees a <=k pair agrees on >=1 of
    the k+1 bands, so the ONLY misses are cap-dropped template buckets)."""
    bands, width = k + 1, 32 // (k + 1)
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, s in sigs.items():
        for b in range(bands):
            buckets.setdefault((b, (s >> (b * width)) & ((1 << width) - 1)), []).append(d)
    pairs = set()
    for members in buckets.values():
        if len(members) > specs.LSH_BUCKET_CAP:
            continue
        for i, da in enumerate(members):
            for db in members[i + 1:]:
                lo, hi = min(da, db), max(da, db)
                ham = bin(sigs[lo] ^ sigs[hi]).count("1")
                if ham <= k:
                    pairs.add((lo, hi, ham))
    return pairs


def test_simhash_banded_matches_brute_force_sf0001(spark):
    """Exact-set equality vs the brute-force replica on the sf0.001 fixture:
    proves the banded join loses nothing the pigeonhole argument promises."""
    sf = "/root/testdata/sf0.001"
    sigs = {r["doc_id"]: r["simhash"] for r in Q.q_simhash(spark, sf).collect()}
    expected = _banded_brute_force(sigs, Q.SIMHASH_HAMMING_K)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in Q.q_simhash_banded(spark, sf).collect()
    }
    assert got == expected
    assert len(got) > 0  # non-vacuous on this corpus


def test_simhash_banded_hot_bucket_cap(spark, hot_corpus_dir):
    """The identical-template cluster (every band bucket = N_HOT > cap) is
    dropped whole — no quadratic pair leak — while the full result still
    equals the brute-force replica (which models the same cap)."""
    sigs = {r["doc_id"]: r["simhash"] for r in Q.q_simhash(spark, hot_corpus_dir).collect()}
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in Q.q_simhash_banded(spark, hot_corpus_dir).collect()
    }
    hot_pairs = [p for p in got if p[0] < N_HOT and p[1] < N_HOT]
    assert hot_pairs == []  # C(200,2) = 19900 pairs without the cap
    assert got == _banded_brute_force(sigs, Q.SIMHASH_HAMMING_K)


def test_caps_do_not_change_testdata_results():
    """The caps are calibrated above anything the synthetic corpora produce
    (BENCH.md): max gram df = 25 and max band bucket = 12 at sf0.1, so the
    oracled results at the driver SFs are bit-identical with caps on."""
    assert specs.NGRAM_DF_CAP >= 100
    assert specs.LSH_BUCKET_CAP >= 32
