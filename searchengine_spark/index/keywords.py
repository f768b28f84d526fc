"""Per-document keyword extraction: top TF-IDF-distinctive terms.

The per-corpus tfidf scorer (index/queries.q_tfidf_scores, reference
searchenginespark.py's scoring loop) answers "which docs match this
query"; curation pipelines also need the transpose — "which terms
characterize this doc" — for tagging, clustering labels, and
weak-supervision features. Standard extraction: weight each (doc,
term) by (1 + log10(tf)) * idf and keep the TOP_KW per doc.

Scale shape: everything hangs off the cached index frames
(index/queries._index — one tokenize scan per session); the ranking
window partitions by doc_id, so per-partition state is one document's
vocabulary. No joins beyond tf |x| idf (word-keyed, the same shuffle
the BM25 scorer pays), no corpus-global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from searchengine_spark.index.queries import _INDEX_CTES, _index

TOP_KW = 3


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    scored = idx.term_frequencies.join(
        idx.idf_values.select("word", "idf"), "word"
    ).select(
        "doc_id",
        "word",
        # rank on the ROUNDED score so cross-engine float noise can't
        # reorder near-ties (oracle-writing convention)
        F.round(
            (F.lit(1.0) + F.log10(F.col("term_freq").cast("double")))
            * F.col("idf"),
            6,
        ).alias("kw_score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("kw_score"), F.asc("word")
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= TOP_KW)
        .select("doc_id", F.col("kw_rank").cast("bigint").alias("kw_rank"),
                "word", "kw_score")
    )


_KEYWORDS_SQL = f"""{_INDEX_CTES},
scored AS (
  SELECT tf.doc_id, tf.word,
         round((1.0 + log10(CAST(tf.term_freq AS DOUBLE))) * idf.idf, 6)
           AS kw_score
  FROM tf JOIN idf ON tf.word = idf.word
),
ranked AS (
  SELECT doc_id, word, kw_score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY kw_score DESC, word ASC) AS kw_rank
  FROM scored
)
SELECT doc_id, kw_rank::BIGINT AS kw_rank, word, kw_score
FROM ranked WHERE kw_rank <= {TOP_KW}
"""

QUERIES = {"text_doc_keywords": q_doc_keywords}
ORACLES = {"text_doc_keywords": _KEYWORDS_SQL}
