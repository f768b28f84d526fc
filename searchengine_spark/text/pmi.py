"""Word co-occurrence PMI: the collocation/feature-mining pass.

Pointwise mutual information over document-level co-occurrence,
pmi(a,b) = log10( P(a,b) / (P(a) P(b)) ) with document-frequency
probabilities — the standard collocation score feeding phrase
detection, topic seeds, and weak-supervision features.

Scale shape: everything derives from the cached index frames. The
pair generation is a doc-keyed self-join of the (doc, word) presence
table — fan-out is per-doc-vocabulary squared, the same bound the
TF-IDF all-pairs join carries (operators/text_sim.py); at 100 TB the
production knobs are the usual two (df-cap the vocabulary, keep only
each doc's top-m TF-IDF terms — index/keywords.py supplies exactly
that) without changing the plan. The co-occurrence agg keys on word
pairs (bounded by vocab^2, heavily pruned by MIN_COOC); df lookups
broadcast the vocabulary-sized idf frame; n_docs rides in as the
lazy 1-row params frame (never a collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.index.queries import _INDEX_CTES, _index

MIN_COOC = 5  # pairs must co-occur in at least this many docs


def q_word_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    dw = idx.term_frequencies.select("doc_id", "word")
    a = dw.select("doc_id", F.col("word").alias("word_a"))
    b = dw.select("doc_id", F.col("word").alias("word_b"))
    cooc = (
        a.join(b, "doc_id")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_COOC)
    )
    dfreq = idx.idf_values.select("word", "doc_freq")
    n_docs = idx.scoring_params.select("n_docs")
    return (
        cooc.join(
            F.broadcast(dfreq.select(F.col("word").alias("word_a"),
                                     F.col("doc_freq").alias("df_a"))),
            "word_a",
        )
        .join(
            F.broadcast(dfreq.select(F.col("word").alias("word_b"),
                                     F.col("doc_freq").alias("df_b"))),
            "word_b",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "word_a",
            "word_b",
            "n_ab",
            F.round(
                F.log10(
                    (F.col("n_ab") * F.col("n_docs")).cast("double")
                    / (F.col("df_a") * F.col("df_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


_PMI_SQL = f"""{_INDEX_CTES},
cooc AS (
  SELECT a.word AS word_a, b.word AS word_b, count(*)::BIGINT AS n_ab
  FROM tf a JOIN tf b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_COOC}
)
SELECT c.word_a, c.word_b, c.n_ab,
       round(log10(CAST(c.n_ab * (SELECT n_docs FROM params) AS DOUBLE)
                   / CAST(da.doc_freq * db.doc_freq AS DOUBLE)), 6) AS pmi
FROM cooc c
JOIN idf da ON c.word_a = da.word
JOIN idf db ON c.word_b = db.word
"""

QUERIES = {"text_word_pmi_pairs": q_word_pmi_pairs}
ORACLES = {"text_word_pmi_pairs": _PMI_SQL}
