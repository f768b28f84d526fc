"""CJK character-bigram segmentation (text/cjk.py)."""

from __future__ import annotations

from helpers import assert_matches_oracle
from searchengine_spark.text.cjk import (
    ORACLES,
    QUERIES,
    cjk_bigram_query_terms,
    cjk_bigram_tokens_column,
)


def _tok(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(cjk_bigram_tokens_column("text").alias("t")).collect()[0].t


def test_cjk_runs_become_overlapping_bigrams(spark):
    assert _tok(spark, "機械学習 data 訓練データ処理") == [
        "機械", "械学", "学習", "data",
        "訓練", "練デ", "デー", "ータ", "タ処", "処理",
    ]


def test_two_char_run_is_its_own_bigram(spark):
    assert _tok(spark, "訓練") == ["訓練"]


def test_non_cjk_scripts_pass_through(spark):
    # Cyrillic/accented Latin are alphabetic — never bigrammed.
    assert _tok(spark, "поиск café straße") == ["поиск", "café", "straße"]


def test_prolonged_sound_mark_stays_in_run(spark):
    # ー (U+30FC) is script=Common; the class includes it explicitly
    # so katakana loanwords segment as one run.
    assert _tok(spark, "データ") == ["デー", "ータ"]


def test_query_terms_match_column_semantics():
    assert cjk_bigram_query_terms("訓練データ café the") == [
        "訓練", "練デ", "デー", "ータ", "café",
    ]


def test_cjk_queries_match_oracle(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), ORACLES[name], sf_dir, name)
