"""Retrieval-metric invariants (the oracle-parity gate covers exact
values; these pin the mathematical contracts)."""

from searchengine_spark.index.evaluation import (
    DISCOUNTS,
    EVAL_K,
    EVAL_QUERY_SETS,
    q_eval_retrieval_metrics,
)


def _rows(spark, sf_dir):
    return {r["query_id"]: r for r in q_eval_retrieval_metrics(spark, sf_dir).collect()}


def test_discounts_are_monotone_decreasing():
    assert DISCOUNTS[0] == 1.0  # rank 1: 1/log2(2)
    assert all(a > b for a, b in zip(DISCOUNTS, DISCOUNTS[1:]))


def test_all_queries_present_and_bounded(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    assert set(rows) == set(EVAL_QUERY_SETS)
    for r in rows.values():
        for m in ("precision_at_k", "recall_at_k", "mrr", "ap_at_k", "ndcg_at_k"):
            assert 0.0 <= r[m] <= 1.0, (r["query_id"], m, r[m])
        assert r["hits"] <= min(r["n_rel"], EVAL_K) or r["n_rel"] == 0
        assert abs(r["precision_at_k"] - r["hits"] / EVAL_K) < 1e-9


def test_single_term_query_all_retrieved_relevant(spark, sf_dir):
    """For a 1-term query every BM25-retrieved doc contains the term,
    so it is binary-relevant: precision@k = min(n_rel, k)/k, MRR = 1."""
    single = [qid for qid, ts in EVAL_QUERY_SETS.items() if len(ts) == 1]
    rows = _rows(spark, sf_dir)
    for qid in single:
        r = rows[qid]
        if r["n_rel"] == 0:
            continue
        assert r["mrr"] == 1.0
        assert r["hits"] == min(r["n_rel"], EVAL_K)
        assert r["ndcg_at_k"] == 1.0  # binary gains, ideal == retrieved set
