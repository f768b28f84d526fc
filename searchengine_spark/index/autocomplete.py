"""Query autocomplete: prefix -> top completions by collection df.

The search-box companion the reference UI types into but never builds
(abh2050/searchengine pyapp.py takes free text with no suggestions):
precompute, for every term prefix up to MAX_PREFIX chars, the TOP_N
vocabulary words ranked by document frequency. Serving is then a
broadcast-joinable lookup table — the standard offline-built
suggestion index.

Scale shape: the input is the VOCABULARY (distinct terms + df), not
the corpus — at 100 TB that is millions of rows, not billions; the
prefix explode multiplies it by <= MAX_PREFIX and the per-prefix
ranking window partitions by prefix (high cardinality, no skew: a
prefix's group is bounded by the vocabulary sharing it). Nothing here
rescans documents; it all hangs off the cached idf frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from searchengine_spark.index.queries import _INDEX_CTES, _index

MAX_PREFIX = 6
TOP_N = 3


def q_autocomplete_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = _index(spark, sf_dir).idf_values.select("word", "doc_freq")
    prefixes = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(F.length("word"), F.lit(MAX_PREFIX))),
                lambda i: F.col("word").substr(F.lit(1), i),
            )
        ).alias("prefix"),
        "word",
        "doc_freq",
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("doc_freq"), F.asc("word"))
    return (
        prefixes.withColumn("completion_rank", F.row_number().over(w))
        .filter(F.col("completion_rank") <= TOP_N)
        .select(
            "prefix",
            F.col("completion_rank").cast("bigint").alias("completion_rank"),
            "word",
            "doc_freq",
        )
    )


_AUTOCOMPLETE_SQL = f"""{_INDEX_CTES},
vocab AS (
  SELECT word, count(*)::BIGINT AS doc_freq FROM tf GROUP BY word
),
pref AS (
  SELECT unnest(list_transform(
           range(1, least(length(word), {MAX_PREFIX}) + 1),
           i -> substr(word, 1, i::INT))) AS prefix,
         word, doc_freq
  FROM vocab
),
ranked AS (
  SELECT prefix, word, doc_freq,
         row_number() OVER (PARTITION BY prefix
                            ORDER BY doc_freq DESC, word ASC) AS completion_rank
  FROM pref
)
SELECT prefix, completion_rank::BIGINT AS completion_rank, word, doc_freq
FROM ranked WHERE completion_rank <= {TOP_N}
"""

QUERIES = {"se_autocomplete_table": q_autocomplete_table}
ORACLES = {"se_autocomplete_table": _AUTOCOMPLETE_SQL}
