"""Unicode text normalization (text/normalize.py)."""

from __future__ import annotations

import unicodedata

from helpers import assert_matches_oracle
from searchengine_spark.text.normalize import (
    MESSY_SUFFIXES,
    ORACLES,
    QUERIES,
    normalize_text_column,
)


def _norm(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(normalize_text_column("text").alias("n")).collect()[0].n


def test_nfc_composes_decomposed_accents(spark):
    decomposed = "café"
    assert _norm(spark, decomposed) == "café"


def test_format_chars_stripped(spark):
    assert _norm(spark, "a​b﻿c­d") == "abcd"


def test_whitespace_collapsed_and_trimmed(spark):
    assert _norm(spark, "  a \t b\r\n c   ") == "a b c"


def test_fixture_twins_normalize_equal():
    # residues 0 (decomposed) and 4 (composed) are the planted merge
    assert MESSY_SUFFIXES[0] != MESSY_SUFFIXES[4]
    assert (
        unicodedata.normalize("NFC", MESSY_SUFFIXES[0]) == MESSY_SUFFIXES[4]
    )


def test_nfc_dedup_merges_exactly_the_twin_pair(spark, sf_dir):
    rows = QUERIES["dedup_nfc_groups"](spark, sf_dir).collect()
    # 8 byte-distinct forms -> 7 normalized groups
    assert len(rows) == len(MESSY_SUFFIXES) - 1
    merged = unicodedata.normalize("NFC", MESSY_SUFFIXES[4])
    by_text = {r.norm_text: r.n_docs for r in rows}
    singles = [v for k, v in by_text.items() if k != merged]
    assert by_text[merged] > max(singles), "twin group must be largest"


def test_normalize_queries_match_oracle(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), ORACLES[name], sf_dir, name)


def test_nfc_exact_audit_halves_the_twin_corpus(spark, sf_dir):
    from searchengine_spark.text.normalize import q_nfc_exact_audit

    row = q_nfc_exact_audit(spark, sf_dir).collect()[0]
    assert row.n_groups_raw == row.n_docs, "twins must be byte-distinct"
    assert row.n_groups_nfc * 2 == row.n_docs, "NFC must merge every pair"
    assert row.n_hidden_dups == row.n_docs // 2
