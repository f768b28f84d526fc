"""Language-routed multilingual path (text/multilingual.py) and the
NFC-normalized index (builder normalize=True): routing correctness,
per-language stopword filtering, NFC-keyed dedup inside the curation
chain, and the ASCII/English defaults pinned unchanged."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from searchengine_spark.text import multilingual as ml
from searchengine_spark.text.tokenizer import (
    STOPWORDS,
    STOPWORDS_BY_LANG,
    stopwords_for,
    sql_tokens_expr,
    tokenize_query,
    unicode_letter_runs,
)


# ------------------------------------------------ defaults pinned


def test_default_stopwords_unchanged():
    # lang=None and lang="en" must be the exact pre-round-13 list.
    assert stopwords_for(None) is STOPWORDS
    assert stopwords_for("en") is STOPWORDS
    assert stopwords_for("nosuchlang") is STOPWORDS


def test_default_sql_tokens_expr_byte_identical():
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    assert sql_tokens_expr("text") == (
        "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), "
        f"w -> length(w) >= 2 AND w NOT IN ({stop}))"
    )


def test_stopword_lists_sql_safe():
    for code, words in STOPWORDS_BY_LANG.items():
        for w in words:
            assert "'" not in w, (code, w)
            assert w == w.lower(), (code, w)


# ------------------------------------------------ query tokenization


def test_unicode_letter_runs_splits_numeric_letters():
    # Nl (Ⅻ) and No (½) are NOT \p{L}; the old [\W\d_] stand-in kept
    # them (ADVICE r12) — the category-L walker must split on them.
    assert unicode_letter_runs("abⅫcd e½f") == ["ab", "cd", "e", "f"]
    assert tokenize_query("abⅫcd data", unicode=True) == ["ab", "cd", "data"]


def test_routed_query_terms_mixed():
    terms = ml.routed_query_terms("données le 機械学習 the поиск")
    # stopwords of ANY language dropped; CJK runs become bigrams
    assert terms == ["données", "機械", "械学", "学習", "поиск"]


# ------------------------------------------------ routing unit tests

ROUTE_CASES = [
    ("der hund und die katze ist nicht im haus", "de"),
    ("le chien est dans la maison pour vous", "fr"),
    ("и не на что он как это все она так", "ru"),
    ("και το να του με για είναι από στο που", "el"),
    ("the model is not ready and they will have been", "en"),
    ("機械学習モデルの訓練データ処理", "cjk"),
]


@pytest.fixture(scope="module")
def routed_fixture(spark):
    rows = [(i, t) for i, (t, _) in enumerate(ROUTE_CASES)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ml.routed_frame(docs).collect()
    return {r["doc_id"]: r for r in out}


def test_langid_routing(routed_fixture):
    for i, (_, want) in enumerate(ROUTE_CASES):
        assert routed_fixture[i]["lang"] == want, (i, routed_fixture[i])


def test_per_language_stopwords_removed(routed_fixture):
    # each doc's own function words must be gone from its words
    assert "der" not in routed_fixture[0]["words"]
    assert "und" not in routed_fixture[0]["words"]
    assert "le" not in routed_fixture[1]["words"]
    assert "est" not in routed_fixture[1]["words"]
    assert "что" not in routed_fixture[2]["words"]
    assert "και" not in routed_fixture[3]["words"]
    assert "the" not in routed_fixture[4]["words"]
    # content words survive
    assert "hund" in routed_fixture[0]["words"]
    assert "chien" in routed_fixture[1]["words"]


def test_cjk_doc_words_are_bigrams(routed_fixture):
    words = routed_fixture[5]["words"]
    assert words, "cjk doc must tokenize"
    assert all(len(w) == 2 for w in words), words
    # overlapping: consecutive bigrams share a character
    assert words[0][1] == words[1][0]
    # n_base counts bigram units for cjk (whole-run counts would
    # spuriously fail the MIN_TOKENS gate)
    assert routed_fixture[5]["n_base"] == len(words)
    assert routed_fixture[5]["n_stop"] == 0


def test_nstop_counts_doc_language_list(routed_fixture):
    de = routed_fixture[0]
    # der/und/die/ist/nicht/im are the >=2-char German stopwords in
    # the sentence (length floor keeps 2-char words)
    assert de["n_stop"] == 6, de


# ------------------------------------------------ curation semantics


def test_nfc_twins_merge_in_exact_dedup(spark):
    # residue-7 tails v0 (decomposed) and v1 (composed) are the same
    # string after NFC; with identical base sentences the two docs'
    # md5(ntext) must collide and exact dedup keeps only the lower id.
    rows = [(7, ml.ML_BASE_SENTS[7] + " " + ml.ML_TAILS[21]),
            (15, ml.ML_BASE_SENTS[7] + " " + ml.ML_TAILS[22])]
    assert rows[0][1] != rows[1][1]  # byte-distinct
    assert unicodedata.normalize("NFC", rows[0][1]) == unicodedata.normalize(
        "NFC", rows[1][1]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    keep = sorted(r["doc_id"] for r in ml.curate_multilingual(docs).collect())
    assert keep == [7]


def test_curation_stages_active(spark, sf_dir):
    # on the fixture corpus every stage must do real work: quality
    # drops (r0 v2 all-stopword tail + natural corpus variation),
    # exact-dup mass (identical fixture texts + the NFC twin merge),
    # and the planted r2 near-dup pair.
    from searchengine_spark.io import load_table

    docs = ml.with_multilingual_text(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()
    quality, exact_keep, drop = ml._cached_ml_stages(spark, sf_dir)
    n_q, n_e, n_d = quality.count(), exact_keep.count(), drop.count()
    assert n_q < n_docs, "quality gate dropped nothing"
    assert n_e < n_q, "exact dedup merged nothing"
    assert n_d > 0, "near-dup stage found nothing (planted r2 pair)"
    keep = ml.q_curated_docs_multilingual(spark, sf_dir)
    assert keep.count() == n_e - n_d


def test_routed_langs_cover_all_routes(spark, sf_dir):
    langs = {
        r["lang"]
        for r in ml.q_routed_langs(spark, sf_dir).select("lang").distinct().collect()
    }
    assert {"en", "de", "es", "fr", "ru", "el", "cjk"} <= langs


def test_stopworded_vocab_has_no_foreign_stopwords(spark, sf_dir):
    vocab = {
        r["word"]
        for r in ml.q_unicode_tokens_stopworded(spark, sf_dir).collect()
    }
    # the noise terms the per-language lists exist to kill (r12
    # verdict task 3): present in the fixture sentences, absent from
    # the routed vocabulary
    for noise in ("der", "und", "les", "est", "что", "και", "the"):
        assert noise not in vocab, noise
    # content words in several scripts survive
    assert "búsqueda" in vocab
    assert "поиск" in vocab
    assert "機械" in vocab  # cjk bigram


def test_confusable_audit_flags_planted_residues(spark, sf_dir):
    rows = ml.q_confusable_script_audit(spark, sf_dir).collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r["doc_id"] % 4, []).append(r)
    # residues 1 (Cyrillic-in-Latin homoglyphs) and 2 (Greek/Cyrillic
    # in Latin) are suspicious on EVERY doc; 0 and 3 never are
    assert all(r["suspicious"] for r in by_res[1])
    assert all(r["suspicious"] for r in by_res[2])
    assert not any(r["suspicious"] for r in by_res[0])
    assert not any(r["suspicious"] for r in by_res[3])
    assert all(r["n_mixed"] == 2 for r in by_res[1])  # pаypal, mosкow


def test_routed_lang_resample_downsamples_dominant(spark, sf_dir):
    routed = ml._cached_routed(spark, sf_dir).select("doc_id", "lang")
    before = {r["lang"]: r["n"] for r in routed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    after = {r["lang"]: r["n"] for r in ml.q_routed_lang_resample(
        spark, sf_dir).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # fr is the dominant route (two residues) — its keep-rate must be
    # the lowest; the rarest routes keep (nearly) everything
    rates = {l: after.get(l, 0) / n for l, n in before.items()}
    assert rates["fr"] == min(rates.values())
    assert rates["fr"] < 1.0
    assert max(rates.values()) > 0.9


def test_routed_chain_cross_engine_parity_randomized(spark):
    """150 pseudo-random multilingual documents, one batched compare:
    the FULL routed chain (NFC normalize -> \\p{L} tokenize -> langid
    argmax + CJK share -> per-language stop filter -> CJK bigram
    resegment, with n_base/n_stop) must agree byte-for-byte between
    Spark and the DuckDB CTE twin. Documents are sampled from the
    marker/stopword/content vocabulary across all six languages plus
    CJK runs, DECOMPOSED accent forms, and Cf characters (ZWSP, BOM,
    soft hyphen) so NFC and the format-strip do real work; the known
    engine-divergent case mappings (Turkish dotted I, final sigma)
    are excluded, as documented in the tokenizer module."""
    import random

    import duckdb

    rng = random.Random(20260817)
    vocab: list[str] = []
    for ws in ml.UNICODE_LANG_MARKERS.values():
        vocab.extend(ws)
    for ws in STOPWORDS_BY_LANG.values():
        vocab.extend(ws)
    vocab += [
        "caf\u00e9", "cafe\u0301", "br\u00fbl\u00e9e",
        "bru\u0302le\u0301e", "na\u00efvet\u00e9",
        "donn\u00e9es", "donne\u0301es", "b\u00fasqueda",
        "\u043f\u043e\u0438\u0441\u043a", "\u043c\u043e\u0434\u0435\u043b\u0438",
        "\u03b4\u03b5\u03b4\u03bf\u03bc\u03ad\u03bd\u03b1",
        "machine", "learning", "zero\u200bwidth",
        "soft\u00adhyphen", "\u6a5f\u68b0\u5b66\u7fd2",
        "\u8a13\u7df4\u30c7\u30fc\u30bf", "\u30e2\u30c7\u30eb",
        "\u51e6\u7406\u306f\u9ad8\u901f",
        "\u30c7\u30fc\u30bf\u5206\u6790\u3068\u691c\u8a3c",
        "mixed\u6a5f\u68b0text", "x", "ab",
    ]
    seps = [" ", "  ", "\t", " \n ", ", ", ". ", " \u2014 ", "\u200b ", " \ufeff"]
    strings = []
    for _ in range(150):
        parts = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        strings.append("".join(p + rng.choice(seps) for p in parts))

    df = spark.createDataFrame(
        list(enumerate(strings)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["lang"], list(r["words"]), r["n_base"], r["n_stop"])
        for r in ml.routed_frame(df).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE src (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", list(enumerate(strings)))
    sql = (
        "WITH mldocs AS (SELECT doc_id, text FROM src)"
        + ml._ROUTED_CTES
        + "\nSELECT doc_id, lang, words, n_base, n_stop FROM mrouted"
    )
    want = {
        row[0]: (row[1], list(row[2]), row[3], row[4])
        for row in con.execute(sql).fetchall()
    }
    assert set(got) == set(want)
    mism = {i: (got[i], want[i], strings[i]) for i in got if got[i] != want[i]}
    assert not mism, f"{len(mism)} diverging docs; first: " + str(
        next(iter(mism.items()))
    )


# ------------------------------------------------ NFC index (task 6)


def test_nfc_index_matches_both_byte_forms(spark):
    from searchengine_spark.index.bm25 import search
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.text.tokenizer import tokens_column

    rows = [
        (1, "the cafe\u0301 serves bru\u0302le\u0301e daily"),  # decomposed
        (2, "the caf\u00e9 serves br\u00fbl\u00e9e daily"),  # composed
        (3, "nothing relevant here at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = tokens_column("text", unicode=True)

    plain = build_index(docs, tokens=toks)
    hits_plain = {
        r["doc_id"]
        for r in plain.term_frequencies.filter(
            F.col("word").isin(["café", "brûlée"])
        ).collect()
    }
    # without normalization the composed-form terms hit ONLY the
    # composed doc — the decomposed twin's accents were lost at
    # tokenize time (combining marks are not \p{L})
    assert hits_plain == {2}

    norm = build_index(docs, tokens=toks, normalize=True)
    hits_norm = {
        r["doc_id"]
        for r in norm.term_frequencies.filter(
            F.col("word").isin(["café", "brûlée"])
        ).collect()
    }
    assert hits_norm == {1, 2}
