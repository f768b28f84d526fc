"""Merge/upsert for batch-maintained tables (no Delta/Iceberg in this
environment — the operator is the JOIN SEMANTICS those formats wrap).

A training-data corpus is refreshed incrementally: a new crawl batch
carries some brand-new docs and some re-crawled (changed) ones. The
merge is one full-outer join on the key:

    updated  -> key in both   -> take the update's row
    inserted -> key only in updates
    kept     -> key only in target

This is exactly Delta's MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT, expressed as a plain DataFrame op, so it runs anywhere and is
DuckDB-oracle-checkable. At 100 TB the join shuffles on the key once;
if the target is bucketed by key (see tests/test_bucketed_join.py)
the shuffle disappears on the target side entirely.

Write-side note: persisting the merged result must go to a NEW
location / table-swap (parquet has no in-place update); the
read-merge-swap cycle is the classic pre-lakehouse pattern and stays
atomic per partition directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Full-outer merge taking the update ROW wholesale when the key
    matches (true MERGE WHEN MATCHED UPDATE semantics: a legitimate
    NULL in an update column overwrites the target value — column
    picks are gated on the update row's PRESENCE, never COALESCEd per
    column). Adds `_merge_action` ('insert' / 'update' / 'keep').

    Both inputs must share a schema. Duplicate keys in `updates` make
    the merge fan out (one output row per duplicate) — dedup the
    batch first (e.g. keep the latest crawl per key via a row_number
    window); tests/test_upsert.py documents the fan-out behavior.
    """
    cols = [c for c in target.columns if c != key]
    t = target.alias("t")
    u = updates.alias("u")
    merged = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    has_update = F.col(f"u.{key}").isNotNull()
    pick = [
        F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key),
        *[
            F.when(has_update, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ],
        F.when(F.col(f"t.{key}").isNull(), F.lit("insert"))
        .when(~has_update, F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("_merge_action"),
    ]
    return merged.select(*pick)


def q_merge_upsert_documents(spark, sf_dir: str):
    """Deterministic merge demo over the documents table: every 10th
    doc is 're-crawled' (text replaced), plus synthetic new doc_ids
    beyond the current max — merged output profiled per action."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    updates = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("text", F.concat(F.lit("recrawled: "), F.col("text")))
    )
    inserts = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("new: "), F.col("text")).alias("text"),
        "lang",
    )
    merged = merge_upsert(docs, updates.unionByName(inserts), "doc_id")
    return merged.groupBy("_merge_action", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("bigint")).alias("total_chars"),
    )


QUERIES = {"rel_merge_upsert": q_merge_upsert_documents}

ORACLES = {
    "rel_merge_upsert": """
        WITH docs AS (SELECT doc_id, text, lang FROM documents),
        upd AS (
          SELECT doc_id, 'recrawled: ' || text AS text, lang
          FROM docs WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id + 1000000, 'new: ' || text, lang
          FROM docs WHERE doc_id % 7 = 0
        ),
        merged AS (
          SELECT COALESCE(u.doc_id, t.doc_id) AS doc_id,
                 CASE WHEN u.doc_id IS NOT NULL THEN u.text ELSE t.text END AS text,
                 CASE WHEN u.doc_id IS NOT NULL THEN u.lang ELSE t.lang END AS lang,
                 CASE WHEN t.doc_id IS NULL THEN 'insert'
                      WHEN u.doc_id IS NULL THEN 'keep'
                      ELSE 'update' END AS _merge_action
          FROM docs t FULL OUTER JOIN upd u ON t.doc_id = u.doc_id
        )
        SELECT _merge_action, lang, COUNT(*) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars
        FROM merged
        GROUP BY _merge_action, lang
    """,
}
