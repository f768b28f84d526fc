"""Degenerate inputs: empty corpora, all-stopword docs, single-doc
corpora — no crashes, sane results."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.bm25 import search
from searchengine_spark.index.builder import build_index
from searchengine_spark.operators.dedup import minhash_bands, neardup_candidate_pairs
from searchengine_spark.pipeline import curate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_empty_corpus(spark):
    docs = _docs(spark, [])
    idx = build_index(docs, cache_tokens=False)
    assert idx.term_frequencies.count() == 0
    assert search(idx, "anything", k=5).count() == 0
    assert minhash_bands(docs).count() == 0
    assert curate(docs).count() == 0


def test_all_stopword_docs_dropped(spark):
    docs = _docs(spark, [(1, "the and of to"), (2, "a an is it")])
    idx = build_index(docs, cache_tokens=False)
    # zero-token docs are excluded from the index entirely
    assert idx.doc_lengths.count() == 0
    assert idx.scoring_params.collect()[0].n_docs == 0


def test_single_doc_corpus(spark):
    docs = _docs(spark, [(1, "murder trial court murder")])
    idx = build_index(docs, cache_tokens=False)
    params = idx.scoring_params.collect()[0]
    assert params.n_docs == 1 and params.avgdl == 4.0
    res = search(idx, "murder", k=5).collect()
    # idf = log10(1/1) = 0 -> score 0, but the doc still matches
    assert len(res) == 1 and res[0].total_score == 0.0


def test_short_docs_no_shingles(spark):
    docs = _docs(spark, [(1, "hello world"), (2, "tiny")])
    assert minhash_bands(docs).count() == 0
    assert neardup_candidate_pairs(minhash_bands(docs)).count() == 0


def test_null_text_rows(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "real content here about courts")],
        "doc_id bigint, text string",
    )
    idx = build_index(docs, cache_tokens=False)
    assert idx.doc_lengths.count() == 1


def test_curate_with_metrics_counts_match_reality(spark, sf_dir):
    """Observation counters must equal independently computed counts
    — free data-quality metrics from the pipeline's single pass."""
    from searchengine_spark.io import load_table
    from searchengine_spark.pipeline import curate, curate_with_metrics

    docs = load_table(spark, sf_dir, "documents")
    keep, get_metrics = curate_with_metrics(docs)
    n_keep = keep.count()  # the action that populates the observations
    m = get_metrics()
    assert m["n_curated"] == n_keep
    assert m["n_quality_pass"] >= n_keep > 0
    assert m["total_tokens_kept"] > 0
    # and the instrumented pipeline returns the same keep-list
    assert n_keep == curate(docs).count()


def test_search_rejects_unknown_idf_variant(spark):
    docs = _docs(spark, [(1, "murder trial court")])
    idx = build_index(docs, cache_tokens=False)
    with pytest.raises(ValueError, match="idf_variant"):
        search(idx, "murder", idf_variant="bm25plus")
