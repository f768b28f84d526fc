"""Language-ID heuristic on native-language fixture text."""

from searchengine_spark.text.langid import identify_language

FIXTURES = [
    (1, "the quick brown fox jumps over the lazy dog and they were not amused", "en"),
    (2, "der hund und die katze sind nicht im haus aber sie haben ein problem", "de"),
    (3, "el perro y el gato no son una familia pero es como para vivir con ellos", "es"),
    (4, "le chien et le chat ne sont pas dans la maison mais ils sont pour vous", "fr"),
]


def test_identify_language_on_native_text(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in FIXTURES], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.lang_guess for r in identify_language(df).collect()}
    for i, _, expect in FIXTURES:
        assert got[i] == expect, f"doc {i}: {got[i]} != {expect}"


def test_marker_hits_positive(spark):
    df = spark.createDataFrame([(1, FIXTURES[0][1])], "doc_id bigint, text string")
    row = identify_language(df).collect()[0]
    assert row.marker_hits >= 4


def test_mixed_language_chunks_flags_code_switching(spark):
    from searchengine_spark.text.langid import (
        CHUNK_CHARS,
        mixed_language_chunks,
    )

    en = (
        "the cat and the dog are not in the house because they have "
        "been with their friends and this is the story that was told "
    )
    fr = (
        "le chat est dans la maison avec les amis qui sont pour vous "
        "dans ce pays et pas une personne qui est sur le chemin des "
    )
    # doc 1: one language padded to several chunks; doc 2: first
    # chunk(s) English, later chunks French — a planted code-switch.
    mono = (en * 10)[: CHUNK_CHARS * 3]
    mixed = (en * 3)[:CHUNK_CHARS] + (fr * 10)[: CHUNK_CHARS * 2]
    df = spark.createDataFrame(
        [(1, mono), (2, mixed)], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in mixed_language_chunks(df).collect()}
    assert not rows[1].is_mixed and rows[1].n_langs == 1
    assert rows[2].is_mixed and rows[2].n_langs >= 2
    assert rows[2].n_chunks == 3 and rows[2].n_informative >= 2


def test_unicode_langid_identifies_every_script(spark):
    """The unicode mode must identify each fixture language — the
    ASCII default scores Cyrillic/Greek/CJK docs 0 everywhere."""
    from searchengine_spark.text.langid import (
        LANGID_SENTS,
        identify_language_unicode,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(LANGID_SENTS)],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.lang_guess
        for r in identify_language_unicode(df).collect()
    }
    assert got == {0: "en", 1: "de", 2: "es", 3: "fr",
                   4: "ru", 5: "el", 6: "cjk", 7: "en"}


def test_unicode_langid_cjk_share_routes_before_markers(spark):
    from searchengine_spark.text.langid import identify_language_unicode

    # mostly-CJK text with a couple of Latin tokens still routes cjk
    df = spark.createDataFrame(
        [(1, "機械学習 モデル 訓練 データ 処理 解析 spark data")],
        "doc_id bigint, text string",
    )
    row = identify_language_unicode(df).collect()[0]
    assert row.lang_guess == "cjk" and row.cjk_share >= 0.7
