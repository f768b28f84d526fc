"""Vocabulary-coverage statistics: per-source OOV rate against a
fixed top-V vocabulary, and word burstiness (variance-to-mean ratio).

Two corpus-health checks every multilingual/multi-source training-
data pipeline runs before tokenizer training:

- **OOV rate**: fix the vocabulary to the global top-V words by
  document frequency (what a budgeted tokenizer/embedding table would
  keep) and measure, per source, the fraction of token OCCURRENCES
  that fall outside it. A source with a high OOV rate will fragment
  into bytes/unks at training time — it needs its own vocab budget or
  a quality look.
- **Burstiness** (Church & Gale 1995, public): variance-to-mean ratio
  of a word's per-document term frequency. Poisson-distributed words
  (function words) have VMR ~= 1; topical/content words are "bursty"
  (VMR >> 1: absent from most docs, repeated when present). The
  standard contentfulness signal for keyword extraction and stopword
  discovery that doesn't need any language resource.

Scale shape: both are one tokenize pass + keyed integer aggregates.
The top-V vocabulary is a TakeOrdered over the word-df table
(vocabulary-bounded) broadcast back; the OOV flag is a broadcast
left join; VMR comes from per-word integer moments (sum tf, sum
tf^2) with the zero-docs correction applied algebraically (words
absent from a doc contribute 0 to both moments, so moments over
PRESENT docs already equal moments over all docs). No windows over
data-sized frames, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.text.tokenizer import sql_tokens_expr, tokens_column

VOCAB_TOP_V = 20  # budgeted vocabulary size (the synthetic corpus
# vocabulary is ~30 words, so the tail is real at every SF)
BURST_MIN_DF = 25  # stability floor for the VMR estimate
BURST_TOP = 20


def _tok(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "source", F.explode(tokens_column("text")).alias("w")
    )


def top_vocab(tok: DataFrame, *, v: int = VOCAB_TOP_V) -> DataFrame:
    """Top-``v`` words by document frequency (tie-break word asc —
    deterministic cross-engine cutoff)."""
    df = tok.select("doc_id", "w").distinct().groupBy("w").agg(
        F.count(F.lit(1)).alias("df")
    )
    return df.orderBy(F.desc("df"), F.asc("w")).limit(v)


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = _tok(docs)
    vocab = top_vocab(tok).select("w", F.lit(1).alias("_in"))
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ),
        )
        .orderBy("source")
    )


def q_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = _tok(docs)
    per_doc = tok.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    moments = per_doc.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("s1"),
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("s2"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    nd = F.col("n_docs").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = F.col("s2").cast("double") / nd - mean * mean
    return (
        moments.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") >= BURST_MIN_DF)
        .select(
            "w",
            "df",
            F.round(mean, 6).alias("mean_tf"),
            F.round(var / mean, 6).alias("vmr"),
        )
        .orderBy(F.desc("vmr"), F.asc("w"))
        .limit(BURST_TOP)
    )


_OOV_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, unnest({sql_tokens_expr("text")}) AS w
  FROM documents
), vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS df
    FROM (SELECT DISTINCT doc_id, w FROM tok)
    GROUP BY w
  ) ORDER BY df DESC, w ASC LIMIT {VOCAB_TOP_V}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM tok LEFT JOIN vocab ON tok.w = vocab.w
GROUP BY source ORDER BY source
"""

_BURST_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({sql_tokens_expr("text")}) AS w
  FROM documents
), per_doc AS (
  SELECT w, doc_id, COUNT(*) AS tf FROM tok GROUP BY w, doc_id
), moments AS (
  SELECT w,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(tf) AS BIGINT) AS s1,
         CAST(SUM(tf * tf) AS BIGINT) AS s2
  FROM per_doc GROUP BY w
), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT w, df,
       round(CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_tf,
       round((CAST(s2 AS DOUBLE) / CAST(n_docs AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE)))
             / (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE)), 6) AS vmr
FROM moments, nd
WHERE df >= {BURST_MIN_DF}
ORDER BY vmr DESC, w ASC LIMIT {BURST_TOP}
"""



KEYNESS_TOP = 3
KEYNESS_MIN_COUNT = 5


def q_source_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood (G^2) keyness: which words are
    significantly OVER-represented in each source vs the rest of the
    corpus (Dunning 1993, public — the standard corpus-linguistics
    "what makes this domain's language different" readout, and the
    per-source cousin of text_drift_psi's slice drift).

    G^2 = 2 * sum over the 2x2 contingency cells of O*ln(O/E); only
    positively-key words (O11 > E11) rank, top KEYNESS_TOP per source.

    Scale shape: one tokenize pass -> (source, word) counts; every
    other operand (word totals, source totals, N) is a vocabulary- or
    source-bounded broadcast joined back onto the |sources| x |vocab|
    cell table, and the ranking window partitions per source over
    vocab-bounded rows. Float discipline: each of the four O*ln(O/E)
    terms is rounded to 12 (in-engine ln on identical rational
    doubles, the Zipf-slope precedent) and the terms fold in a fixed
    order; G^2 rounds to 6 before ranking and output."""
    docs = load_table(spark, sf_dir, "documents")
    tok = _tok(docs)
    cells = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("o11"))
    wtot = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    stot = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n1"))
    ntot = tok.agg(F.count(F.lit(1)).alias("nn"))

    j = (
        cells.join(F.broadcast(wtot), "w")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(ntot))
    )
    o11 = F.col("o11").cast("double")
    o12 = (F.col("c") - F.col("o11")).cast("double")
    o21 = (F.col("n1") - F.col("o11")).cast("double")
    o22 = (F.col("nn") - F.col("c") - F.col("n1") + F.col("o11")).cast(
        "double"
    )
    cd = F.col("c").cast("double")
    n1d = F.col("n1").cast("double")
    nnd = F.col("nn").cast("double")
    e11 = n1d * cd / nnd
    e12 = (nnd - n1d) * cd / nnd
    e21 = n1d * (nnd - cd) / nnd
    e22 = (nnd - n1d) * (nnd - cd) / nnd

    def term(o, e):
        return F.round(
            F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0)), 12
        )

    g2 = F.round(
        F.lit(2.0)
        * (term(o11, e11) + term(o12, e12) + term(o21, e21) + term(o22, e22)),
        6,
    )
    from pyspark.sql import Window

    scored = j.filter(
        (F.col("o11") >= KEYNESS_MIN_COUNT) & (o11 > e11)
    ).select(
        "source", "w", F.col("o11").cast("bigint").alias("n_in_source"),
        g2.alias("g2"),
    )
    # per-source window over vocabulary-bounded rows
    rk = Window.partitionBy("source").orderBy(F.desc("g2"), F.asc("w"))
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= KEYNESS_TOP)
        .select("source", F.col("rank").cast("bigint").alias("rank"), "w",
                "n_in_source", "g2")
        .orderBy("source", "rank")
    )


_KEYNESS_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, unnest({sql_tokens_expr("text")}) AS w
  FROM documents
), cells AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS o11 FROM tok GROUP BY 1, 2
), wtot AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
), stot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n1 FROM tok GROUP BY source
), ntot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM tok
), j AS (
  SELECT cells.source, cells.w, o11, c, n1, nn FROM cells
  JOIN wtot USING (w) JOIN stot USING (source) CROSS JOIN ntot
), g AS (
  SELECT source, w, o11,
    round(2.0 * (
      round(CASE WHEN CAST(o11 AS DOUBLE) > 0
                 THEN CAST(o11 AS DOUBLE) * ln(CAST(o11 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)))
                 ELSE 0.0 END, 12)
      + round(CASE WHEN CAST(c - o11 AS DOUBLE) > 0
                 THEN CAST(c - o11 AS DOUBLE) * ln(CAST(c - o11 AS DOUBLE)
                      / ((CAST(nn AS DOUBLE) - CAST(n1 AS DOUBLE)) * CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)))
                 ELSE 0.0 END, 12)
      + round(CASE WHEN CAST(n1 - o11 AS DOUBLE) > 0
                 THEN CAST(n1 - o11 AS DOUBLE) * ln(CAST(n1 - o11 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(c AS DOUBLE)) / CAST(nn AS DOUBLE)))
                 ELSE 0.0 END, 12)
      + round(CASE WHEN CAST(nn - c - n1 + o11 AS DOUBLE) > 0
                 THEN CAST(nn - c - n1 + o11 AS DOUBLE) * ln(CAST(nn - c - n1 + o11 AS DOUBLE)
                      / ((CAST(nn AS DOUBLE) - CAST(n1 AS DOUBLE)) * (CAST(nn AS DOUBLE) - CAST(c AS DOUBLE)) / CAST(nn AS DOUBLE)))
                 ELSE 0.0 END, 12)
    ), 6) AS g2
  FROM j
  WHERE o11 >= {KEYNESS_MIN_COUNT}
    AND CAST(o11 AS DOUBLE) > CAST(n1 AS DOUBLE) * CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)
)
SELECT source, rank, w, o11 AS n_in_source, g2 FROM (
  SELECT source, w, o11, g2,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY g2 DESC, w ASC) AS BIGINT) AS rank
  FROM g
)
WHERE rank <= {KEYNESS_TOP}
ORDER BY source, rank
"""


QUERIES = {
    "text_oov_rate": q_oov_rate,
    "text_source_keyness": q_source_keyness,
    "text_word_burstiness": q_word_burstiness,
}
ORACLES = {
    "text_oov_rate": _OOV_SQL,
    "text_source_keyness": _KEYNESS_SQL,
    "text_word_burstiness": _BURST_SQL,
}
