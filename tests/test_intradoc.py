"""Intra-doc repeated-n-gram scrubbing (text/intradoc.py)."""

from pyspark.sql import functions as F

from searchengine_spark.text import intradoc as I
from tests.helpers import assert_matches_oracle


def test_scrub_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "click here click here click here now"),
            (1, "a b c a b c"),  # second "a b c" repeats bigrams a-b, b-c
            (2, "all tokens unique in this doc"),
            (3, "x x x x"),  # "x x" repeats from pos 1 on
            (4, "solo"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in I.intra_doc_scrub(docs).collect()}
    # doc 0: "click here" repeats at pos 2 and 4 -> those windows go
    assert rows[0]["scrubbed_text"] == "click here now"
    assert rows[0]["n_removed"] == 4
    # doc 1: dup starts at pos 3 (a b) and pos 4 (b c) cover pos 3..5
    assert rows[1]["scrubbed_text"] == "a b c"
    assert rows[1]["n_removed"] == 3
    # doc 2: nothing repeats
    assert rows[2]["scrubbed_text"] == "all tokens unique in this doc"
    assert rows[2]["n_removed"] == 0
    # doc 3: first occurrence survives — never scrubs to empty
    assert rows[3]["scrubbed_text"] == "x"
    assert rows[3]["n_removed"] == 3
    # doc 4: single token, no gram
    assert rows[4]["scrubbed_text"] == "solo"
    assert rows[4]["n_removed"] == 0


def test_intra_doc_scrub_matches_oracle_and_fires(spark, sf_dir):
    df = I.q_intra_doc_scrub(spark, sf_dir)
    agg = df.agg(
        F.sum("n_removed").alias("nr"),
        F.sum((F.col("n_removed") == 0).cast("long")).alias("clean"),
    ).collect()[0]
    # repeated bigrams exist in the corpus, but not in every doc
    assert agg["nr"] > 0 and agg["clean"] > 0
    assert_matches_oracle(
        df,
        I.ORACLES["text_intra_doc_scrub"],
        sf_dir,
        name="text_intra_doc_scrub",
    )
