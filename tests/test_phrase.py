"""Phrase-match semantics on a hand-built corpus."""

import pytest

from searchengine_spark.index.phrase import (
    build_positional_index,
    phrase_match,
    suggest_terms,
)
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pos(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join beats merge join on small tables"),
            (2, "join hash is reversed so no phrase here"),
            (3, "hash join hash join twice counted"),
            (4, "hash only"),
        ],
        "doc_id bigint, text string",
    )
    return build_positional_index(docs).cache()


def test_positions_are_zero_based_sorted(pos):
    rows = {(r.doc_id, r.word): r.positions for r in pos.collect()}
    assert rows[(1, "hash")] == [0]
    assert rows[(1, "join")] == [1, 4]
    assert rows[(3, "join")] == [1, 3]


def test_phrase_match_counts(pos):
    got = {r.doc_id: r.n_occurrences for r in phrase_match(pos, ["hash", "join"]).collect()}
    assert got == {1: 1, 3: 2}  # doc2 reversed, doc4 missing term


def test_trigram_phrase(pos):
    got = {r.doc_id: r.n_occurrences for r in phrase_match(pos, ["hash", "join", "beat"]).collect()}
    assert got == {}  # 'beats' not stemmed here; no exact trigram
    got2 = {r.doc_id: r.n_occurrences for r in phrase_match(pos, ["hash", "join", "beats"]).collect()}
    assert got2 == {1: 1}


def test_search_with_correction(spark):
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.index.phrase import search_with_correction

    docs = spark.createDataFrame(
        [
            (1, "murder trial court verdict"),
            (2, "contract breach court appeal"),
        ],
        "doc_id bigint, text string",
    )
    idx = build_index(docs, cache_tokens=False)
    res, corrections = search_with_correction(idx, "murdr trial")
    assert corrections == {"murdr": "murder"}
    assert [r.doc_id for r in res.collect()] == [1]

    # fully-known query: no corrections, same as plain search
    res2, corr2 = search_with_correction(idx, "court")
    assert corr2 == {} and res2.count() == 2


def test_suggest_terms(spark, pos):
    vocab = pos.groupBy("word").agg(F.countDistinct("doc_id").alias("doc_freq"))
    got = [r.word for r in suggest_terms(vocab, "jion", max_distance=2).collect()]
    assert got[0] == "join"


def test_best_passage_picks_densest_window(spark):
    from searchengine_spark.index.phrase import best_passage

    # hits at 0 and 2 (2-in-10 window) vs a 3-hit cluster at 30..34
    text = (
        "spark x join " + "filler " * 27 + "spark join fast spark end"
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = best_passage(docs, ["spark", "join", "fast"]).collect()[0]
    assert got["n_hits"] == 4  # spark, join, fast, spark
    assert got["passage"].startswith("spark join fast spark")
    assert got["passage_start"] == 30


def test_best_passage_tie_breaks_to_earliest(spark):
    docs = spark.createDataFrame(
        [(1, "join a b c d e f g h i join x y z")], "doc_id long, text string"
    )
    from searchengine_spark.index.phrase import best_passage

    got = best_passage(docs, ["join"]).collect()[0]
    assert (got["passage_start"], got["n_hits"]) == (0, 1)
