"""merge_upsert semantics: row-wholesale updates (NULLs overwrite),
insert/keep/update classification, duplicate-key fan-out contract."""

from pyspark.sql import functions as F

from searchengine_spark.operators.upsert import merge_upsert


def _target(spark):
    return spark.createDataFrame(
        [(1, "one", "en"), (2, "two", "en"), (3, "three", "de")],
        "doc_id bigint, text string, lang string",
    )


def test_update_insert_keep_classification(spark):
    updates = spark.createDataFrame(
        [(2, "TWO", "fr"), (9, "nine", "en")],
        "doc_id bigint, text string, lang string",
    )
    rows = {r.doc_id: r for r in merge_upsert(_target(spark), updates, "doc_id").collect()}
    assert rows[1]._merge_action == "keep" and rows[1].text == "one"
    assert rows[2]._merge_action == "update" and rows[2].text == "TWO" and rows[2].lang == "fr"
    assert rows[3]._merge_action == "keep"
    assert rows[9]._merge_action == "insert" and rows[9].text == "nine"
    assert len(rows) == 4


def test_update_null_overwrites_target(spark):
    """MERGE takes the update ROW wholesale: an explicit NULL in the
    update clears the target value (no per-column coalesce)."""
    updates = spark.createDataFrame(
        [(3, None, "de")], "doc_id bigint, text string, lang string"
    )
    rows = {r.doc_id: r for r in merge_upsert(_target(spark), updates, "doc_id").collect()}
    assert rows[3]._merge_action == "update"
    assert rows[3].text is None
    assert rows[3].lang == "de"


def test_duplicate_update_keys_fan_out(spark):
    """Documented contract: duplicate keys in the batch fan out, one
    output row per duplicate — callers dedup upstream."""
    updates = spark.createDataFrame(
        [(2, "a", "en"), (2, "b", "en")], "doc_id bigint, text string, lang string"
    )
    out = merge_upsert(_target(spark), updates, "doc_id")
    assert out.filter(F.col("doc_id") == 2).count() == 2


def test_idempotent_when_update_equals_target(spark):
    """Re-applying the same batch yields the same merged content."""
    updates = spark.createDataFrame(
        [(2, "TWO", "fr")], "doc_id bigint, text string, lang string"
    )
    once = merge_upsert(_target(spark), updates, "doc_id")
    twice = merge_upsert(once.drop("_merge_action"), updates, "doc_id")
    a = sorted((r.doc_id, r.text, r.lang) for r in once.collect())
    b = sorted((r.doc_id, r.text, r.lang) for r in twice.collect())
    assert a == b
