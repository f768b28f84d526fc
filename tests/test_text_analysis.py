"""Entropy + compressibility quality signals: boilerplate must score
below varied prose on both, and the zlib ratio must be deterministic."""

from searchengine_spark.text.analysis import compression_ratio


def _docs(spark):
    prose = (
        "the quick brown fox jumps over a lazy dog while seventeen "
        "zebras quietly examine fjords beyond the misty plateau"
    )
    boiler = "click here to subscribe " * 6
    return spark.createDataFrame(
        [(1, prose), (2, boiler)], "doc_id long, text string"
    )


def test_boilerplate_scores_low_on_both_signals(spark):
    docs = _docs(spark)
    # entropy on the planted docs (same aggregation shape as the
    # registered q_char_entropy, which is corpus-bound)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").count()
    n = F.sum("count").over(Window.partitionBy("doc_id"))
    ent2 = {
        r["doc_id"]: r["e"]
        for r in counts.select(
            "doc_id", ((F.col("count") / n) * F.log2(F.col("count") / n)).alias("t")
        )
        .groupBy("doc_id")
        .agg((-F.sum("t")).alias("e"))
        .collect()
    }
    assert ent2[2] < ent2[1]  # boilerplate < prose

    cr = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(docs).collect()
    }
    assert cr[2] < cr[1]  # boilerplate compresses (much) better
    # deterministic: identical on a second run
    cr_again = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(docs).collect()
    }
    assert cr == cr_again


def test_compression_ratio_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert got[1]["raw_bytes"] == 0 and got[1]["compression_ratio"] is None
    assert got[2]["raw_bytes"] == 0 and got[2]["compression_ratio"] is None
