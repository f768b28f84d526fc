"""CAP caselaw corpus adapter — the reference's nested input shape.

The reference ingests JSONL where one row is a court case and the
searched text lives in `casebody.data.opinions[*].text`
(/root/reference/searchenginespark.py:74-77). Two extraction modes:

- concat mode (default): all opinion texts of a case joined into one
  logical document — no explode, pure array lambda
  (SURVEY.md §2.7 F7). doc_id stays unique.
- explode mode: one row per opinion, doc_id duplicated across a
  case's opinions — the reference's actual explode semantics
  (searchenginespark.py:74, 1,107 opinion rows -> 1,000 doc_ids).
  build_index() then aggregates tokens per doc_id, so multi-opinion
  cases contribute all opinions' tokens to one logical document,
  exactly like the reference.

Null/empty handling mirrors the reference's guards
(nltksearchv1.py:104-108): NULL casebody or empty opinions arrays
yield no text (concat -> empty string -> zero tokens -> dropped by
build_index's empty filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.text.tokenizer import tokens_column


def case_text(docs: DataFrame, *, id_col: str = "id") -> DataFrame:
    """(doc_id, text): all opinions of a case joined with spaces."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(
            F.concat_ws(
                " ",
                F.transform(
                    F.col("casebody.data.opinions"), lambda o: o.getField("text")
                ),
            ),
            F.lit(""),
        ).alias("text"),
    )


def opinion_rows(docs: DataFrame, *, id_col: str = "id") -> DataFrame:
    """(doc_id, opinion struct) — reference explode semantics; rows
    with NULL/empty opinions arrays are dropped (plain explode)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode("casebody.data.opinions").alias("opinion"),
    )


def opinion_text_table(docs: DataFrame, *, id_col: str = "id") -> DataFrame:
    """(doc_id, opinion_text) snippet store — duplicates doc_id for
    multi-opinion cases, like the reference's opinion_text.parquet."""
    return opinion_rows(docs, id_col=id_col).select(
        "doc_id", F.col("opinion.text").alias("opinion_text")
    )


def case_tokens(docs: DataFrame, *, id_col: str = "id", stem: bool = False):
    """Token arrays straight from the nested shape (doc_id, words) —
    feed to build_index(tokens=...). Uses concat mode so a case's
    opinions form one document."""
    txt = case_text(docs, id_col=id_col)
    return txt.select("doc_id", tokens_column("text", stem=stem).alias("words"))
