"""Recall gate for the approximate ANN path.

ann_ivf is the one remaining rows-only driver query (its probe set is
approximate by design), so its quality is pinned here instead: recall@5
against the exact ann_cosine result on the deterministic sf0.001 fixture.
A future change that silently destroys recall fails this test.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_ann_ivf_recall_at_5(spark):
    from rust_s2_spark.engine.queries import q_ann_cosine, q_ann_ivf

    exact = _topk(q_ann_cosine(spark, SF))
    approx = _topk(q_ann_ivf(spark, SF))
    assert set(exact) == set(approx)  # same query set
    hits = total = 0
    per_query = {}
    for qid, truth in exact.items():
        got = approx.get(qid, set())
        hits += len(truth & got)
        total += len(truth)
        per_query[qid] = len(truth & got) / len(truth)
    recall = hits / total
    # nprobe=4 of 16 lists; measured 1.00 on this fixture — gate at 0.9
    assert recall >= 0.9, f"recall@5={recall:.3f} per-query={per_query}"
