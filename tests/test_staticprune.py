"""index/staticprune.py — tau-proportional static index pruning.
Oracle parity via test_oracle_parity.py; here: the pruning invariants
and a planted corpus where the trade is provable."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from searchengine_spark.index.staticprune import (
    PRUNE_K,
    PRUNE_TAU,
    QUERIES,
)


def test_pruning_trade_on_fixture(spark, sf_dir):
    r = QUERIES["se_static_pruning_recall"](spark, sf_dir).collect()[0]
    assert r.k == PRUNE_K
    assert 0 < r.n_postings_kept < r.n_postings_full, "tau must really prune"
    assert r.n_overlap <= r.k
    assert abs(r.frac_kept - r.n_postings_kept / r.n_postings_full) < 1e-6
    assert abs(r.recall - r.n_overlap / r.k) < 1e-6


def test_per_term_best_posting_always_survives(spark, sf_dir):
    # tau-proportional pruning keeps, for every term, at least the
    # argmax posting (s = ub >= tau*ub for tau <= 1)
    from searchengine_spark.index.bm25 import bm25_term_score
    from searchengine_spark.index.queries import _index

    idx = _index(spark, sf_dir)
    ts = (
        idx.term_frequencies.join(idx.idf_values.select("word", "idf"), "word")
        .join(idx.doc_lengths, "doc_id")
        .crossJoin(F.broadcast(idx.scoring_params.select("avgdl")))
        .select(
            "word",
            bm25_term_score(
                F.col("term_freq"), F.col("doc_length"), F.col("avgdl"),
                F.col("idf"),
            ).alias("s"),
        )
    )
    ub = ts.groupBy("word").agg(F.round(F.max("s"), 6).alias("ub"))
    kept_words = (
        ts.join(ub, "word")
        .filter(F.round(F.col("s"), 6) >= F.round(F.lit(PRUNE_TAU) * F.col("ub"), 6))
        .select("word")
        .distinct()
        .count()
    )
    assert kept_words == ub.count(), "no term may lose its whole posting list"


def test_uniform_term_scores_are_never_pruned(spark, tmp_path_factory):
    # every doc = the same text -> every posting IS its term's max ->
    # nothing pruned, recall exactly 1
    d = str(tmp_path_factory.mktemp("sp_uniform"))
    rows = [
        (i, "spark join window fast", "en", "src0", 22) for i in range(30)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    r = QUERIES["se_static_pruning_recall"](spark, d).collect()[0]
    assert r.n_postings_kept == r.n_postings_full
    assert r.recall == 1.0
