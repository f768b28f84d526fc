"""index/bm25f.py — field-weighted BM25F: zoning semantics and the
single-saturation property. Registry oracle parity runs in
test_oracle_parity.py."""

from __future__ import annotations

import os

import pytest

from searchengine_spark.index.bm25f import (
    K1F,
    TITLE_TOKENS,
    W_BODY,
    W_TITLE,
    _BM25F_SQL,
    q_bm25f_topk,
)
from tests.helpers import assert_matches_oracle

_FILLER = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _plant_docs(spark, tmp_path_factory, texts, name):
    d = str(tmp_path_factory.mktemp(name))
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_title_hit_outranks_body_hit(spark, tmp_path_factory):
    # doc 0: "spark" inside the first TITLE_TOKENS positions;
    # doc 1: identical token multiset, "spark" past the title zone.
    title_doc = "spark " + _FILLER + " one two three"
    body_doc = _FILLER + " spark one two three"
    assert len(title_doc.split()) == len(body_doc.split())
    # several distractor docs so idf is defined and positive
    distractors = ["table row merge sort value key line batch"] * 6
    d = _plant_docs(
        spark, tmp_path_factory, [title_doc, body_doc] + distractors, "bm25f_zone"
    )
    from searchengine_spark.io import session_cached  # noqa: F401

    out = {r.doc_id: r.total_score for r in q_bm25f_topk(spark, d).collect()}
    assert 0 in out and 1 in out
    assert out[0] > out[1], "a title hit must outrank the same hit in the body"
    assert_matches_oracle(
        q_bm25f_topk(spark, d), _BM25F_SQL, d, "se_bm25f_topk planted"
    )


def test_weighted_tf_saturates_once(spark, tmp_path_factory):
    # Two title hits must score LESS than 2x one title hit (shared-k1
    # saturation on the combined wtf — the property the naive
    # per-field-BM25 sum violates).
    one = "spark " + _FILLER[:30] + " pad pad pad pad"
    two = "spark spark " + _FILLER[:30] + " pad pad pad"
    distractors = ["table row merge sort value key line batch"] * 6
    d = _plant_docs(spark, tmp_path_factory, [one, two] + distractors, "bm25f_sat")
    out = {r.doc_id: r.total_score for r in q_bm25f_topk(spark, d).collect()}
    assert out[1] > out[0], "more hits must still score higher"
    assert out[1] < 2 * out[0], "saturation must be sublinear"


def test_constants_sane():
    assert W_TITLE > W_BODY > 0
    assert K1F > 0 and TITLE_TOKENS > 0
