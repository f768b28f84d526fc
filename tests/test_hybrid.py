"""RRF fusion: hand-computed scores, absent-list convention, and the
one property that matters — presence in both lists dominates."""

import pytest

from searchengine_spark.index.hybrid import RRF_K, rrf_fuse


def _lists(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank int"
    )
    return lex, sem


def test_rrf_hand_computed(spark):
    lex, sem = _lists(spark)
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([lex, sem]).collect()}
    k = RRF_K
    assert got[1] == pytest.approx(round(1 / (k + 1), 6))
    assert got[2] == pytest.approx(round(1 / (k + 2) + 1 / (k + 1), 6))
    assert got[3] == pytest.approx(round(1 / (k + 3), 6))
    assert got[4] == pytest.approx(round(1 / (k + 2), 6))  # sem-only doc kept


def test_rrf_both_lists_beat_single_list(spark):
    lex, sem = _lists(spark)
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([lex, sem]).collect()}
    # doc 2 (rank 2 lex + rank 1 sem) outranks every single-list doc,
    # including the lex winner at rank 1.
    assert got[2] == max(got.values())
