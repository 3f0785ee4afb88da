"""doc_keyterms (TF-IDF-shaped keyword extraction) vs a pure-Python
replay: the lift is an exact rational — bigint products, one IEEE
division, round 6 — so the replay must agree bit-for-bit, including the
rank order (ties break by token ASC)."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from rust_s2_spark.engine import specs


def _round_half_up(x: float, nd: int) -> float:
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


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
            lift = _round_half_up((f * n_docs) / (ntok[doc_id] * df[tok]), 6)
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
        (r.doc_id, r.rnk): (r.tok, r.tf, r.df, r.n_tokens, r.lift_r) for r in rows
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
