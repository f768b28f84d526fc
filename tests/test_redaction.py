"""Redaction: planted PII is scrubbed, clean text passes through,
rule order protects URLs containing emails/digits."""

from searchengine_spark.text.redaction import scrub_documents


def _scrub(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return scrub_documents(df).collect()[0].text


def test_email_url_number_scrubbed(spark):
    got = _scrub(
        spark,
        "contact john.doe+x@example.co.uk or https://ex.com/a?id=1234567 call 5551234567 now",
    )
    assert got == "contact <EMAIL> or <URL> call <NUM> now"


def test_short_numbers_survive(spark):
    assert _scrub(spark, "top 10 of 99999 items") == "top 10 of 99999 items"


def test_url_with_email_inside_is_one_url(spark):
    # URL rule runs first, so the embedded @ never matches the email rule.
    got = _scrub(spark, "see http://ex.com/u/a@b.com/profile page")
    assert got == "see <URL> page"


def test_whitespace_normalized(spark):
    assert _scrub(spark, "  a\tb\n\nc  ") == "a b c"


def test_clean_corpus_text_unchanged(spark, sf_dir):
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    changed = (
        scrub_documents(docs)
        .alias("s")
        .join(docs.alias("o"), "doc_id")
        .filter(F.col("s.text") != F.col("o.text"))
        .count()
    )
    # synthetic corpus has no PII and already-normal whitespace
    assert changed == 0
