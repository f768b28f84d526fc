"""Intra-document repeated-n-gram scrubbing.

Completes the Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better") dedup suite: `operators/dedup.py` handles
CROSS-doc verbatim spans; this module removes repetition WITHIN a
single document — the looping/boilerplate pathology ("click here
click here click here ...") that survives every cross-doc pass
because no other document shares it.

Rule (single pass, deterministic): token position q is a *dup start*
when the W-gram beginning at q already occurred at an earlier
position of the same document; a token is removed when any dup start
covers it (q <= pos < q+W). First occurrences always survive, so a
document never scrubs to empty. W=2 here — the synthetic corpus
draws ~40 tokens from a ~30-word vocabulary, so repeated bigrams are
common while repeated 5-grams (the threshold real pipelines use)
almost never occur; the operator is W-parametric.

Scale shape: every stage is keyed by doc_id — the gram window, the
(doc_id, gram) first-occurrence min, the covering-window max, and
the reassembly collect are all doc-local, so state is bounded by
document length and the only shuffle is the doc_id repartition.
No UDF; reassembly is collect_list + array_sort + array_join
(the same pattern as dedup.span_scrubbed_docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

W = 2  # gram width; see docstring for why 2 on the synthetic corpus


def intra_doc_scrub(docs: DataFrame, *, w: int = W) -> DataFrame:
    """(doc_id, scrubbed_text, n_removed) with later repeats of any
    within-doc W-gram removed."""
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    gram_parts = [F.col("tok")] + [
        F.lead("tok", i).over(by_doc) for i in range(1, w)
    ]
    gram = tok.withColumn("gram", F.concat_ws(" ", *gram_parts)).withColumn(
        "gram",
        # a trailing partial gram must not alias a real one
        F.when(F.lead("tok", w - 1).over(by_doc).isNotNull(), F.col("gram")),
    )
    first = Window.partitionBy("doc_id", "gram")
    flagged = gram.withColumn(
        "ds",
        (
            F.col("gram").isNotNull()
            & (F.col("pos") > F.min("pos").over(first))
        ).cast("int"),
    )
    covered = flagged.withColumn(
        "removed", F.max("ds").over(by_doc.rowsBetween(-(w - 1), 0))
    )
    return (
        covered.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("removed") == 0,
                                F.struct("pos", "tok"),
                            )
                        )
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("scrubbed_text"),
            F.sum("removed").cast("bigint").alias("n_removed"),
        )
    )


def q_intra_doc_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return intra_doc_scrub(docs).orderBy("doc_id")


_INTRA_SQL = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), tok AS (
      SELECT doc_id, unnest(w) AS tok,
             generate_subscripts(w, 1) - 1 AS pos
      FROM t
    ), g AS (
      SELECT doc_id, pos, tok,
             CASE WHEN lead(tok, {W - 1})
                         OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
                  THEN tok || ' ' ||
                       lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
             END AS gram
      FROM tok
    ), d AS (
      SELECT doc_id, pos, tok,
             CASE WHEN gram IS NOT NULL
                       AND pos > MIN(pos) OVER (PARTITION BY doc_id, gram)
                  THEN 1 ELSE 0 END AS ds
      FROM g
    ), r AS (
      SELECT doc_id, pos, tok,
             MAX(ds) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW)
               AS removed
      FROM d
    )
    SELECT doc_id,
           COALESCE(
             string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE removed = 0),
             '') AS scrubbed_text,
           CAST(SUM(removed) AS BIGINT) AS n_removed
    FROM r GROUP BY doc_id ORDER BY doc_id
"""

QUERIES = {"text_intra_doc_scrub": q_intra_doc_scrub}
ORACLES = {"text_intra_doc_scrub": _INTRA_SQL}
