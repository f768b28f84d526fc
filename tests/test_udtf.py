"""UDTF sentence splitter: lateral expansion via SQL and parity with
the native split path."""

import pytest
from pyspark.sql import functions as F


TEXT = "First sentence. Second one! Third? Trailing"


def test_udtf_lateral_sql(spark):
    from searchengine_spark.operators.udtf import SplitSentences

    spark.udtf.register("split_sentences", SplitSentences)
    df = spark.createDataFrame([(1, TEXT)], "doc_id bigint, text string")
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.* FROM udtf_docs, LATERAL split_sentences(text) s"
    ).collect()
    assert [(r.sentence_id, r.sentence) for r in rows] == [
        (0, "First sentence."),
        (1, "Second one!"),
        (2, "Third?"),
        (3, "Trailing"),
    ]
    assert all(r.n_chars == len(r.sentence) for r in rows)


def test_native_path_matches_udtf(spark):
    from searchengine_spark.operators.udtf import SplitSentences, split_sentences_native

    spark.udtf.register("split_sentences", SplitSentences)
    df = spark.createDataFrame(
        [(1, TEXT), (2, "One only"), (3, "")], "doc_id bigint, text string"
    )
    df.createOrReplaceTempView("udtf_docs2")
    via_udtf = {
        (r.doc_id, r.sentence_id): r.sentence
        for r in spark.sql(
            "SELECT doc_id, s.* FROM udtf_docs2, LATERAL split_sentences(text) s"
        ).collect()
    }
    via_native = {
        (r.doc_id, r.sentence_id): r.sentence
        for r in split_sentences_native(df).collect()
    }
    assert via_udtf == via_native
