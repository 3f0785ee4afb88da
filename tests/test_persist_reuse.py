"""Query-scoped persisted intermediates must not accumulate: repeated
invocations of the persisting queries reuse the keyed cached relation, so
executor storage stays bounded in a long-lived session (ADVICE round 3)."""

from rust_s2_spark.engine import queries as Q

SF = "/root/testdata/sf0.001"


def _n_persisted(spark):
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_repeat_invocations_do_not_stack_persists(spark):
    Q.q_ngram_jaccard(spark, SF).count()
    Q.q_minhash_lsh(spark, SF).count()
    base_aux = len(Q._AUX_CACHE)
    base_rdds = _n_persisted(spark)
    for _ in range(3):
        Q.q_ngram_jaccard(spark, SF).count()
        Q.q_minhash_lsh(spark, SF).count()
    assert len(Q._AUX_CACHE) == base_aux
    assert _n_persisted(spark) == base_rdds

    r1 = Q.q_knn_cellring(spark, SF)
    base_rdds = _n_persisted(spark)
    r2 = Q.q_knn_cellring(spark, SF)
    assert r2 is r1  # memoized result, no re-search
    assert _n_persisted(spark) == base_rdds

    # and the reclamation hook still releases everything it tracked
    Q.clear_geo_cache()
    assert len(Q._AUX_CACHE) == 0 and len(Q._KNN_RESULT_CACHE) == 0
