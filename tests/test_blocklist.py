"""Blocklist content filtering: policy semantics + oracle parity."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.text import blocklist as B
from tests.helpers import assert_matches_oracle


def test_blocklist_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "the slow merge broke everything"),  # sev-3 -> dropped
            (1, "big vector hash join window spark"),  # 2+1+1=4 -> dropped
            (2, "hash join and window spark only"),  # 1+1=2 -> kept
            (3, "slowest merger bigger vectors"),  # substrings must NOT hit
            (4, "Big Vector uppercase"),  # case-insensitive, 2 -> kept
            (5, ""),  # empty doc
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in B.blocklist_audit(docs).collect()}
    assert rows[0]["dropped"] and rows[0]["sev_total"] == 3
    assert rows[1]["dropped"] and rows[1]["n_hits"] == 3
    assert not rows[2]["dropped"] and rows[2]["sev_total"] == 2
    assert rows[3]["n_hits"] == 0 and not rows[3]["dropped"]
    assert rows[4]["n_hits"] == 1 and not rows[4]["dropped"]
    assert rows[5]["n_hits"] == 0


def test_blocklist_filter_matches_oracle_and_is_nondegenerate(spark, sf_dir):
    df = B.q_blocklist_filter(spark, sf_dir)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dropped").cast("long")).alias("nd"),
        F.sum("n_hits").alias("nh"),
    ).collect()[0]
    # the policy must actually fire on the corpus, but not drop it all
    assert agg["nh"] > 0
    assert 0 < agg["nd"] < agg["n"]
    assert_matches_oracle(
        df,
        B.ORACLES["text_blocklist_filter"],
        sf_dir,
        name="text_blocklist_filter",
    )


def test_join_form_identical_to_inline_form(spark, sf_dir):
    """Two independent implementations of the same policy — the
    inline contains() fold and the n-gram equi-join — must agree row
    for row on the corpus."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    inline = B.blocklist_audit(docs)
    joined = B.blocklist_audit_join(docs, spark)
    assert inline.exceptAll(joined).count() == 0
    assert joined.exceptAll(inline).count() == 0


def test_join_form_matches_oracle(spark, sf_dir):
    df = B.q_blocklist_join_filter(spark, sf_dir)
    assert_matches_oracle(
        df,
        B.ORACLES["text_blocklist_join_filter"],
        sf_dir,
        name="text_blocklist_join_filter",
    )
