"""Incremental index maintenance must be indistinguishable from a
full rebuild — same stats, same postings, same BM25 ranking."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.bm25 import search
from searchengine_spark.index.builder import build_index
from searchengine_spark.index.incremental import append_to_index


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark join window fast table"),
        (2, "merge sort table value"),
        (3, "spark spark join batch stream"),
        (4, "window window window fast"),
        (5, "hash group filter value table"),
        (6, "stream batch vector join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_append_equals_full_rebuild(docs):
    full = build_index(docs)
    base = build_index(docs.filter(F.col("doc_id") <= 4))
    inc = append_to_index(base, docs.filter(F.col("doc_id") > 4))

    assert sorted(inc.scoring_params.collect()) == sorted(full.scoring_params.collect())
    assert sorted(inc.idf_values.collect()) == sorted(full.idf_values.collect())
    assert sorted(inc.inverted_index.collect()) == sorted(full.inverted_index.collect())
    assert sorted(inc.term_frequencies.collect()) == sorted(
        full.term_frequencies.collect()
    )
    assert sorted(inc.doc_lengths.collect()) == sorted(full.doc_lengths.collect())


def test_append_preserves_bm25_ranking(docs):
    full = build_index(docs)
    base = build_index(docs.filter(F.col("doc_id") <= 3))
    inc = append_to_index(base, docs.filter(F.col("doc_id") > 3))

    want = search(full, "spark window", k=6).collect()
    got = search(inc, "spark window", k=6).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["total_score"] == pytest.approx(w["total_score"], abs=0, rel=0)


def test_append_batch_with_new_vocabulary(docs, spark):
    base = build_index(docs)
    batch = spark.createDataFrame(
        [(100, "zebra quark spark")], "doc_id long, text string"
    )
    inc = append_to_index(base, batch)
    idf = {r["word"]: r["doc_freq"] for r in inc.idf_values.collect()}
    assert idf["zebra"] == 1  # brand-new term enters the vocabulary
    assert idf["spark"] == 3  # existing term's df bumps by one
    n = inc.scoring_params.collect()[0]
    assert n["n_docs"] == 7
