"""MMR re-ranking: diversity actually trades against relevance."""

from searchengine_spark.index.mmr import LAM, M_SELECT, q_mmr_rerank


def test_mmr_rank_structure(spark, sf_dir):
    rows = sorted(q_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r["mmr_rank"])
    assert 1 <= len(rows) <= M_SELECT
    assert [r["mmr_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # rank 1 is the pure-relevance argmax; its mmr is the undamped score
    assert abs(rows[0]["mmr_score"] - round(LAM * rows[0]["rel"], 6)) < 1e-9
    for r in rows[1:]:
        # later picks pay a (non-negative) redundancy penalty
        assert r["mmr_score"] <= LAM * r["rel"] + 1e-9


def test_mmr_diverges_from_pure_bm25_order(spark, sf_dir):
    """On this corpus the redundancy penalty must actually reorder
    something vs plain BM25 top-M (if it never does, the operator is
    a no-op and the test should force choosing a better corpus/λ)."""
    from pyspark.sql import functions as F

    from searchengine_spark.index.queries import q_bm25_scores

    bm25 = [
        r["doc_id"]
        for r in q_bm25_scores(spark, sf_dir)
        .orderBy(F.desc("total_score"), F.asc("doc_id"))
        .limit(M_SELECT)
        .collect()
    ]
    mmr = [
        r["doc_id"]
        for r in sorted(
            q_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r["mmr_rank"]
        )
    ]
    assert mmr != bm25
