"""Behavioral tests for Gopher-style quality gating — planted docs
with hand-computed signals. (Corpus-scale oracle parity is covered by
test_oracle_parity.py.)"""

from searchengine_spark.text.quality import (
    MAX_ADJACENT_DUP_FRAC,
    MIN_WORDS,
    gopher_gate,
    top_bigram_repetition,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gate_signals_hand_computed(spark):
    # 8 words, one adjacent dup pair ("batch batch"), 6 distinct,
    # one stopword ("the").
    rows = [(1, "the batch batch scan join merge sort scan")]
    out = gopher_gate(_docs(spark, rows)).collect()[0]
    assert out.n_words == 8
    assert out.n_stopwords == 1
    assert out.adjacent_dup_frac == round(1 / 7, 6)
    assert out.distinct_frac == round(6 / 8, 6)
    assert out.mean_word_len == round(34 / 8, 6)
    # Fails only on the word-count floor.
    assert not out.passes
    assert out.n_words < MIN_WORDS


def test_gate_rejects_repetitive_doc(spark):
    # Enough words, but pathologically repetitive: "spam spam spam..."
    import itertools

    vocab = ["".join(t) for t in itertools.product("abcde", repeat=4)][:40]
    good = "the " + " ".join(vocab)
    spam = "the " + "spam " * 60
    out = {
        r.doc_id: r for r in gopher_gate(_docs(spark, [(1, good), (2, spam)])).collect()
    }
    assert out[1].passes
    assert not out[2].passes
    assert out[2].adjacent_dup_frac > MAX_ADJACENT_DUP_FRAC


def test_single_word_doc_no_division_error(spark):
    out = gopher_gate(_docs(spark, [(1, "word")])).collect()[0]
    assert out.adjacent_dup_frac == 0.0
    assert out.n_words == 1


def test_top_bigram_hand_computed(spark):
    # "a b a b a b" -> bigrams: "a b" x3, "b a" x2 -> top is "a b",
    # char frac = 3 * 2 / 6 = 1.0
    rows = [(1, "a b a b a b"), (2, "x y z")]
    out = {r.doc_id: r for r in top_bigram_repetition(_docs(spark, rows)).collect()}
    assert out[1].top_bigram == "a b"
    assert out[1].n_occurrences == 3
    assert out[1].top_bigram_char_frac == 1.0
    # Tie (both bigrams occur once) broken alphabetically.
    assert out[2].top_bigram == "x y"
    assert out[2].n_occurrences == 1


def test_one_word_docs_absent_from_bigram_output(spark):
    out = top_bigram_repetition(_docs(spark, [(1, "solo"), (2, "a b")])).collect()
    assert [r.doc_id for r in out] == [2]


def test_gate_expr_equals_signals_passes(spark, sf_dir):
    """The standalone boolean gate expression must agree with the
    passes column of the signals frame on the real corpus."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.text.quality import gate_passes_expr, gopher_gate
    from searchengine_spark.text.tokenizer import raw_tokens_column

    docs = load_table(spark, sf_dir, "documents")
    via_expr = {
        r.doc_id
        for r in docs.select("doc_id", raw_tokens_column(F.col("text")).alias("toks"))
        .filter((F.size("toks") > 0) & gate_passes_expr(F.col("toks")))
        .collect()
    }
    via_signals = {
        r.doc_id for r in gopher_gate(docs).filter("passes").collect()
    }
    assert via_expr == via_signals


def test_gopher_gate_is_streaming_safe(spark, sf_dir):
    """The gate is a pure map stage, so it must run unchanged on an
    unbounded stream and emit exactly the batch survivors."""
    from searchengine_spark.io import load_table
    from searchengine_spark.streaming.events import read_table_stream, run_to_memory
    from searchengine_spark.text.quality import gopher_gate

    stream = read_table_stream(spark, sf_dir, "documents")
    assert stream.isStreaming
    gated = gopher_gate(stream).filter("passes")
    run_to_memory(gated, "gate_stream_mem", output_mode="append")
    got = {r.doc_id for r in spark.table("gate_stream_mem").collect()}
    want = {
        r.doc_id
        for r in gopher_gate(load_table(spark, sf_dir, "documents"))
        .filter("passes")
        .collect()
    }
    assert got == want


def test_dup_ngram_fraction_hand_computed(spark):
    from searchengine_spark.text.quality import dup_ngram_char_fraction

    # "a b c d e" repeated twice + unique tail: the 5-gram "a b c d e"
    # appears twice (at positions 1 and 6).
    rep = "a b c d e a b c d e zz yy xx ww vv"
    norep = "q w e r t y u i o p"
    out = {
        r.doc_id: r.dup_ngram_char_frac
        for r in dup_ngram_char_fraction(
            spark.createDataFrame(
                [(1, rep), (2, norep)], "doc_id bigint, text string"
            )
        ).collect()
    }
    # doc 1: dup 5-grams: "a b c d e" x2 (5 chars each) plus the
    # overlapping window count stays 1 for others -> dup_chars=10;
    # tok_chars = 10*1 + 5*2 = 20 -> 0.5
    assert out[1] == 0.5
    assert out[2] == 0.0


def test_dup_ngram_short_docs_excluded(spark):
    from searchengine_spark.text.quality import dup_ngram_char_fraction

    out = dup_ngram_char_fraction(
        spark.createDataFrame([(1, "only four words here")], "doc_id bigint, text string")
    ).collect()
    assert out == []


def test_readability_hand_computed(spark, tmp_path):
    import os

    from searchengine_spark.text.analysis import q_readability

    # "the cat sat. it was dry!" -> words 6, sentences 2,
    # syllables: the(1) cat(1) sat(1) it(1) was(1) dry(1: y-group) = 6
    df = spark.createDataFrame(
        [(1, "the cat sat. it was dry!", "en", "t", 24)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.write.parquet(os.path.join(tmp_path, "documents.parquet"))
    [r] = q_readability(spark, str(tmp_path)).collect()
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    wps, spw = 6 / 2, 6 / 6
    assert r["flesch_ease"] == round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    assert r["fk_grade"] == round(0.39 * wps + 11.8 * spw - 15.59, 6)


def test_quality_calibration_is_per_source(spark):
    from searchengine_spark.text.quality import quality_percentile_by_source

    # source A: diversity 1.0, 0.75, 0.5; source B: one doc.
    # A global threshold on the raw signal would treat B's 0.5 the
    # same as A's worst; calibration ranks within source instead.
    rows = [
        (1, "alpha beta gamma delta", "A"),          # distinct 1.0
        (2, "alpha alpha beta gamma", "A"),          # 0.75
        (3, "alpha alpha beta beta", "A"),           # 0.5
        (4, "word word other other", "B"),           # 0.5 but best-of-B
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        r["doc_id"]: (r["quality_pct"], r["keep"])
        for r in quality_percentile_by_source(df).collect()
    }
    assert got[1] == (1.0, True)
    assert got[2] == (0.5, True)
    assert got[3] == (0.0, False)   # bottom of A: dropped
    assert got[4] == (0.0, False)   # single-doc source: pct 0 in both engines


def test_unicode_gate_passes_non_english(spark):
    """The multilingual gate admits well-formed Russian and CJK docs
    the ASCII gate cannot even tokenize (they produce ZERO rows
    there), while repetitive junk still fails."""
    from searchengine_spark.text.quality import (
        gopher_gate,
        gopher_gate_unicode,
    )

    ru = ("и не на что он как это все она так его но да вы за "
          "поиск данных система модель обучение качество результат "
          "программа вычисление таблица запрос индекс документ слово "
          "текст анализ проверка число значение пример уровень метод")
    kanji = "機械学習訓練処理解析結果品質検証構築設計"
    ja = " ".join(
        kanji[i % len(kanji)] + kanji[(i * 7 + 3) % len(kanji)]
        + kanji[(i * 11 + 5) % len(kanji)]
        for i in range(40)
    )
    junk = "спам спам спам спам спам " * 10
    df = spark.createDataFrame(
        [(1, ru), (2, ja), (3, junk)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.passes, r.marker_hits, float(r.cjk_share))
        for r in gopher_gate_unicode(df).collect()
    }
    assert got[1][0] is True and got[1][1] >= 10  # Russian: marker evidence
    assert got[2][0] is True and got[2][2] == 1.0  # CJK: script-share route
    assert got[3][0] is False  # repetitive junk still fails
    # the ASCII gate tokenizes all three to nothing — no rows at all
    assert gopher_gate(df).count() == 0


def test_unicode_gate_matches_oracle(spark, sf_dir):
    from helpers import assert_matches_oracle

    from searchengine_spark.text.quality import ORACLES, QUERIES

    name = "text_gopher_gate_unicode"
    assert_matches_oracle(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir, name)
