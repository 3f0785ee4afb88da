"""doc_quality (Gopher-style curation filter) vs a pure-Python replay:
every signal is exact integer char math, flags derive from unrounded
int/int IEEE divisions, and the keep decision must be non-trivial."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb

from rust_s2_spark.engine import specs


def _round_half_up(x: float, nd: int) -> float:
    """Spark's BigDecimal HALF_UP rounding (Python round() is half-even —
    they differ on exactly-representable halfway doubles like 37/128)."""
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


def _replay(text: str):
    n_chars = len(text)
    n_tokens = n_chars - len(text.replace(" ", "")) + 1
    n_distinct = len(set(text.split(" ")))
    n_vowels = sum(text.count(v) for v in specs.VOWELS)
    padded = " " + text.lower() + " "
    stop_hits = sum(
        (len(padded) - len(padded.replace(f" {m} ", ""))) // (len(m) + 2)
        for m in specs.QUALITY_STOPWORDS
    )
    dr = n_distinct / n_tokens
    vr = n_vowels / n_chars
    f_len = specs.QUALITY_LEN_MIN <= n_tokens <= specs.QUALITY_LEN_MAX
    f_stop = stop_hits >= specs.QUALITY_STOP_MIN
    f_rep = dr >= specs.QUALITY_DISTINCT_MIN
    f_vowel = specs.QUALITY_VOWEL_MIN <= vr <= specs.QUALITY_VOWEL_MAX
    score = (int(f_len) + int(f_stop) + int(f_rep) + int(f_vowel)) / 4.0
    return (
        n_tokens,
        n_distinct,
        stop_hits,
        _round_half_up(dr, 6),
        _round_half_up(vr, 6),
        f_len,
        f_stop,
        f_rep,
        f_vowel,
        score,
        score >= 0.75,
    )


def test_doc_quality_matches_python_replay(spark):
    from rust_s2_spark.engine.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {r.doc_id: r for r in QUERIES["doc_quality"](spark, sf).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    assert len(rows) == len(docs)
    for doc_id, text in docs:
        r = rows[doc_id]
        got = (
            r.n_tokens,
            r.n_distinct,
            r.stop_hits,
            r.distinct_ratio_r,
            r.vowel_ratio_r,
            r.flag_len,
            r.flag_stop,
            r.flag_rep,
            r.flag_vowel,
            r.quality_score,
            r.keep,
        )
        assert got == _replay(text), f"doc {doc_id}"


def test_doc_quality_decision_is_nontrivial(spark):
    """The keep flag must split the corpus (neither all-keep nor all-drop)
    and every score quartile must be represented — guards against a
    threshold drifting off the data distribution."""
    from rust_s2_spark.engine.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["doc_quality"](spark, sf).collect()
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)
    # each individual flag must also discriminate
    for flag in ("flag_len", "flag_stop", "flag_rep", "flag_vowel"):
        vals = {getattr(r, flag) for r in rows}
        assert vals == {True, False}, flag


def test_doc_quality_plan_is_pure_map(spark):
    """Zero Exchanges: the filter composes with the scan (a 100 TB corpus
    pass costs one read, no shuffle)."""
    from rust_s2_spark.engine.queries import QUERIES

    plan = (
        QUERIES["doc_quality"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
