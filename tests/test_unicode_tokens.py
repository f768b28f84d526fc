"""Unicode tokenizer mode (round-11 verdict item 3).

Two invariants:
1. The DEFAULT (ASCII, reference-parity) mode must not move — golden
   rows pin that non-Latin text still tokenizes to nothing there.
2. unicode=True tokenizes every script identically in Spark and the
   DuckDB oracle (the driver's hash compare at sf0.01 is the full
   proof; here the same compare runs at sf0.001 plus hand goldens).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from helpers import assert_matches_oracle
from searchengine_spark.index.unicode_search import ORACLES, QUERIES
from searchengine_spark.text.tokenizer import tokenize_query, tokens_column

MIXED = "Café CRÈME 42 naïveté — поиск данных 機械学習 the running dog"


def _tok(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(tokens_column("text", **kw).alias("t")).collect()[0].t


def test_ascii_default_pinned(spark):
    # GOLDEN: the reference-parity mode drops every non-ASCII token
    # (and splits on the accented codepoints). Changing this breaks
    # reference parity — the unicode mode exists so this never has to.
    assert _tok(spark, MIXED) == ["caf", "cr", "me", "na", "vet", "running", "dog"]


def test_unicode_mode_keeps_scripts(spark):
    assert _tok(spark, MIXED, unicode=True) == [
        "café", "crème", "naïveté", "поиск", "данных", "機械学習",
        "running", "dog",
    ]  # "42", "—", 1-char "a"-likes, and stopword "the" are gone


def test_unicode_stopwords_and_floor_unchanged(spark):
    # Stopword list and the 2-char floor apply identically in both
    # modes; "où" (2 chars) survives, "à" (1 char) does not.
    assert _tok(spark, "the à où et is", unicode=True) == ["où", "et"]


def test_tokenize_query_unicode():
    assert tokenize_query(MIXED, unicode=True) == [
        "café", "crème", "naïveté", "поиск", "данных", "機械学習",
        "running", "dog",
    ]
    assert tokenize_query(MIXED) == [
        "caf", "cr", "me", "na", "vet", "running", "dog",
    ]


def test_unicode_queries_match_oracle(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert_matches_oracle(fn(spark, sf_dir), ORACLES[name], sf_dir, name)


def test_unicode_tokenizer_cross_engine_parity_randomized(spark):
    """200 pseudo-random mixed-script strings, one batched compare:
    Spark's Java-regex tokenization must equal DuckDB's RE2 twin
    byte-for-byte. The alphabet deliberately spans Latin-1, Cyrillic,
    Greek, CJK, digits, and punctuation, and deliberately EXCLUDES
    the known engine-divergent case-mapping codepoints (Turkish
    dotted İ, final sigma Σ) the module docstring documents."""
    import random

    import duckdb

    from searchengine_spark.text.tokenizer import sql_tokens_expr

    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "àâäçèéêëîïôöùûüñÀÂÄÇÈÉÊËÎÏÔÖÙÛÜÑßæœ"
        "абвгдежзиклмнопрстуфАБВГДЕЖЗИКЛМНОПРСТУФ"
        "αβγδεζηθικλμνξοπρστυφαβγδε"
        "機械学習訓練処理解析結果品質検証モデルデータこれはです"
        "0123456789 .,;:!?()[]{}-_/\\'\"\t\n«»—…§¶©®µ"
    )
    rng = random.Random(20260816)
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(200)
    ]

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "id int, text string"
    )
    got = {
        r.id: list(r.t)
        for r in df.select(
            "id", tokens_column("text", unicode=True).alias("t")
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(strings))
    )
    want = {
        i: list(toks)
        for i, toks in con.execute(
            f"SELECT id, {sql_tokens_expr('text', unicode=True)} FROM t"
        ).fetchall()
    }
    mismatches = {
        i: (got[i], want[i], strings[i])
        for i in got
        if got[i] != want[i]
    }
    assert not mismatches, f"{len(mismatches)} diverging strings; first: " + str(
        next(iter(mismatches.items()))
    )
