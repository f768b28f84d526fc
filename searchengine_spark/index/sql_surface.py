"""Spark-SQL surface for the BM25 engine.

The reference sketches (broken) SQL scoring at
/root/reference/searchenginespark.py:214-235 — a single SELECT that
joins tf x doc_lengths x idf and computes BM25 inline. This module
does it properly: register the index tables as temp views and run
one parameterized SQL statement (no string-interpolated user input —
terms are bound via a VALUES-derived terms view, fixing the
injection-prone .format() of the reference).

The DataFrame path (bm25.search) and this SQL path must produce
identical results — asserted in tests/test_sql_surface.py, mirroring
the reference's own 3.2-vs-3.3 duality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.index.builder import InvertedIndex

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def register_index_views(spark: SparkSession, index: InvertedIndex) -> None:
    index.term_frequencies.createOrReplaceTempView("term_frequencies")
    index.doc_lengths.createOrReplaceTempView("document_lengths")
    index.idf_values.createOrReplaceTempView("idf_values")
    index.scoring_params.createOrReplaceTempView("scoring_params")


def search_sql(
    spark: SparkSession,
    terms: list[str],
    k: int = 10,
    *,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """BM25 top-k as ONE SQL statement over the registered views.

    Terms are passed as a bound array parameter and exploded into a
    terms relation — the semi-join replaces the reference's quoted
    IN-list (searchenginespark.py:231).
    """
    return spark.sql(
        f"""
        WITH terms AS (SELECT DISTINCT explode(:terms) AS word),
        scored AS (
          SELECT t.doc_id,
                 i.idf * (t.term_freq * ({k1} + 1.0)) /
                   (t.term_freq + {k1} * (1.0 - {b} + {b} * d.doc_length / p.avgdl))
                   AS term_score
          FROM term_frequencies t
          JOIN terms q ON t.word = q.word
          JOIN idf_values i ON t.word = i.word
          JOIN document_lengths d ON t.doc_id = d.doc_id
          CROSS JOIN scoring_params p
        )
        SELECT doc_id, SUM(term_score) AS total_score
        FROM scored
        GROUP BY doc_id
        ORDER BY total_score DESC, doc_id ASC
        LIMIT {int(k)}
        """,
        args={"terms": terms},
    )
