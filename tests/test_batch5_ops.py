"""Langid confusion, source Pareto, and the stream-static enrichment
replay: cross-query consistency invariants."""

from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.streaming.replay import q_stream_enriched_rollup_replay
from searchengine_spark.text.analysis import q_source_pareto
from searchengine_spark.text.langid import q_lang_guess, q_langid_confusion


def test_confusion_marginals_match_lang_guess(spark, sf_dir):
    rows = q_langid_confusion(spark, sf_dir).collect()
    guesses = q_lang_guess(spark, sf_dir).groupBy("lang_guess").count().collect()
    per_guess = {r["lang_guess"]: r["count"] for r in guesses}
    got = {}
    for r in rows:
        got[r["lang_guess"]] = got.get(r["lang_guess"], 0) + r["n"]
    assert got == per_guess
    by_truth = {}
    for r in rows:
        by_truth.setdefault(r["lang"], []).append(r["rate"])
    for lang, rates in by_truth.items():
        assert abs(sum(rates) - 1.0) < 1e-4, lang


def test_pareto_cumulative_and_head(spark, sf_dir):
    rows = sorted(
        q_source_pareto(spark, sf_dir).collect(), key=lambda r: r["cum_share"]
    )
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-9
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    # head-80 is a prefix of the ordering, and its sources' cumulative
    # share reaches at least 0.8
    flags = [r["in_head80"] for r in rows]
    assert sorted(flags, reverse=True) == flags
    head = [r for r in rows if r["in_head80"]]
    assert head and head[-1]["cum_share"] >= 0.8


def test_enriched_rollup_matches_batch_join(spark, sf_dir):
    out = q_stream_enriched_rollup_replay(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    batch = (
        ev.join(cust, ev.user_id == cust.c_custkey, "left")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "c_mktsegment"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {
        (r["window_start"], r["c_mktsegment"]): r["n_events"]
        for r in out.collect()
    }
    want = {
        (r["window_start"], r["c_mktsegment"]): r["n_events"]
        for r in batch.collect()
    }
    assert got == want
