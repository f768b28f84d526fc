"""Asymmetric containment: planted quote recall + threshold exactness."""

import pandas as pd

from searchengine_spark.operators.containment import (
    CONT_DEN,
    CONT_NUM,
    containment_pairs,
    q_containment_pairs,
)
from searchengine_spark.operators.dedup import shingle_frame


def _docs(spark, texts):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    return shingle_frame(df)


def test_planted_quote_is_found_one_direction_only(spark):
    short = "the quick brown fox jumps over the lazy dog"
    long = (
        "intro words first " + short + " and then a very long tail "
        "with many additional distinct tokens stretching the union far "
        "beyond anything jaccard would accept for this planted quote"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(_docs(spark, [short, long])).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (1, 0) not in pairs  # long doc is NOT contained in the quote


def test_threshold_is_exact_not_approximate(spark):
    # doc0 has 6 shingles (8 tokens); doc1 shares exactly 5 of 6
    # -> containment 5/6 >= 4/5; doc2 shares 4 of 6 -> 2/3 < 4/5
    base = "aa bb cc dd ee ff gg hh"
    mostly = "aa bb cc dd ee ff gg zz"
    half = "aa bb cc dd ee ff zz yy"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in containment_pairs(_docs(spark, [base, mostly, half])).collect()
    }
    assert CONT_NUM / CONT_DEN == 0.8
    assert (0, 1) in got and (1, 0) in got
    assert (0, 2) not in got and (2, 0) not in got


def test_registry_query_runs(spark, sf_dir):
    out = q_containment_pairs(spark, sf_dir)
    assert out.columns == ["doc_a", "doc_b", "containment"]
    for r in out.collect():
        assert r["containment"] >= CONT_NUM / CONT_DEN - 1e-9
        assert r["doc_a"] != r["doc_b"]
