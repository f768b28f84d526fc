"""LSH recall audit: internal consistency + planted high-jaccard pair."""

import pandas as pd

from searchengine_spark.operators.dedup import shingle_frame
from searchengine_spark.operators.lsh_eval import lsh_recall, q_lsh_recall


def test_audit_counts_consistent(spark, sf_dir):
    row = q_lsh_recall(spark, sf_dir).collect()[0]
    assert 0 <= row["n_caught"] <= row["n_true"]
    assert row["n_caught"] <= row["n_candidates"]
    if row["n_true"]:
        assert abs(row["lsh_recall"] - row["n_caught"] / row["n_true"]) < 1e-6
    else:
        assert row["lsh_recall"] is None


def test_identical_docs_are_always_caught(spark):
    text = (
        "spark join window fast shuffle partition broadcast filter "
        "aggregate sort merge exchange codegen stage task executor"
    )
    other = "completely different tokens about nothing shared at all here now"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": [text, text, other]})
    )
    row = lsh_recall(shingle_frame(df)).collect()[0]
    # identical docs share every band; recall over true pairs = 1.0
    assert row["n_true"] == 1 and row["n_caught"] == 1
    assert row["lsh_recall"] == 1.0
