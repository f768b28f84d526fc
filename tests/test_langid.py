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
