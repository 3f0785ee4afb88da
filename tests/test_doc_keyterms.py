"""doc_keyterms (TF-IDF-shaped keyword extraction) vs a pure-Python
replay: the 6-dp lift is an exact integer half-up division (no floats
anywhere), so the replay must agree bit-for-bit, including the rank
order (ties break by token ASC)."""

from __future__ import annotations

from collections import Counter

import duckdb

from rust_s2_spark.engine import specs


def _lift_e6(p: int, q: int) -> int:
    """Correctly-rounded half-up 6-dp ratio p/q as a scaled integer."""
    return (2_000_000 * p + q) // (2 * q)


def _replay(docs: list[tuple[int, str]]):
    n_docs = len(docs)
    tf: dict[int, Counter] = {}
    ntok: dict[int, int] = {}
    for doc_id, text in docs:
        ntok[doc_id] = len(text) - len(text.replace(" ", "")) + 1
        tf[doc_id] = Counter(t for t in text.split(" ") if t != "")
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    out = {}
    for doc_id, c in tf.items():
        scored = []
        for tok, f in c.items():
            lift = _lift_e6(f * n_docs, ntok[doc_id] * df[tok])
            scored.append((-lift, tok, f))
        scored.sort()
        for rnk, (neg, tok, f) in enumerate(scored[: specs.KEYTERMS_K], start=1):
            out[(doc_id, rnk)] = (tok, f, df[tok], ntok[doc_id], -neg)
    return out


def test_doc_keyterms_matches_python_replay(spark):
    from rust_s2_spark.engine.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(f"SELECT doc_id, text FROM '{sf}/documents.parquet'").fetchall()
    want = _replay(docs)
    rows = QUERIES["doc_keyterms"](spark, sf).collect()
    got = {
        (r.doc_id, r.rnk): (r.tok, r.tf, r.df, r.n_tokens, r.lift_e6) for r in rows
    }
    assert got == want
    # every doc contributes exactly K ranked terms, ranks 1..K
    assert len(got) == len(docs) * specs.KEYTERMS_K
    # ranking is genuinely non-trivial: lift varies within most docs
    varied = sum(
        1
        for d, _ in docs
        if len({got[(d, r)][4] for r in range(1, specs.KEYTERMS_K + 1)}) > 1
    )
    assert varied > len(docs) * 0.5
