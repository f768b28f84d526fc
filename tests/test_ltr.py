"""LTR feature-table invariants against the engine's own BM25."""

from pyspark.sql import functions as F

from searchengine_spark.index.evaluation import EVAL_QUERY_SETS
from searchengine_spark.index.ltr import q_ltr_features
from searchengine_spark.index.queries import QUERIES as IDX_QUERIES


def test_feature_invariants(spark, sf_dir):
    df = q_ltr_features(spark, sf_dir).cache()
    n_terms = {qid: len(ts) for qid, ts in EVAL_QUERY_SETS.items()}
    bad = df.filter(
        (F.col("coverage") <= 0)
        | (F.col("coverage") > 1)
        | (F.col("matched_terms") < 1)
        | (F.col("tf_sum") < F.col("max_tf"))
        | (F.col("doc_length") < F.col("tf_sum"))
        | (F.col("dl_norm") <= 0)
        | (F.col("bm25") <= 0)
    ).count()
    assert bad == 0
    for r in df.groupBy("query_id").agg(F.max("matched_terms").alias("m")).collect():
        assert r["m"] <= n_terms[r["query_id"]]


def test_bm25_feature_matches_engine_scores(spark, sf_dir):
    # the bm25 column for the single-term query must equal the
    # engine's se_bm25_scores surface for that term's docs
    feats = q_ltr_features(spark, sf_dir)
    single = [qid for qid, ts in EVAL_QUERY_SETS.items() if ts == ("fast",)]
    assert single
    got = {
        r["doc_id"]: r["bm25"]
        for r in feats.filter(F.col("query_id") == single[0]).collect()
    }
    scores = IDX_QUERIES["se_bm25_scores"](spark, sf_dir)
    # se_bm25_scores covers the fixed 4-term workload; restrict via a
    # recomputation over matched_terms==1 docs is not possible there,
    # so check subset-consistency: every LTR doc appears with a
    # positive engine score (the full-equality check is the oracle's).
    engine_docs = {r["doc_id"] for r in scores.collect()}
    assert set(got) <= engine_docs
    assert all(v > 0 for v in got.values())
