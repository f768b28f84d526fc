"""Corpus drift detection: per-token population stability index.

The monitoring half of a continuously-ingested training corpus: has
the token distribution of the new data drifted from the reference
slice? Classic PSI per token t:

    psi_t = (p_t - q_t) * ln(p_t / q_t)

with add-one-smoothed probabilities p (reference slice) and q
(candidate slice); large per-token contributions name the words
driving the drift, which a single scalar never does. Emitting the
per-token rows (not the summed scalar) is also what keeps the result
engine-exact: each row is one deterministic double expression, with
no order-dependent global float accumulation — consumers sum the
column if they want the scalar.

The two slices here are deterministic hash-halves of `documents`
(same md5-bucket machinery as train/val splits), so the expected
drift is ~0 — the interesting content is the exactness of the
machinery, proven by the oracle; a planted test drives it with a
genuinely shifted distribution.

Scale shape: two filtered token counts (one shuffle each, map-side
partials), a full-outer join on the token (vocabulary-sized), then
map-only arithmetic. Top-K by combined count bounds the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import ensure_min_partitions, load_table
from searchengine_spark.operators.sampling import N_BUCKETS, hash_bucket
from searchengine_spark.text.tokenizer import raw_tokens_column, sql_raw_tokens_expr

TOP_K = 50


def token_psi(
    ref_docs: DataFrame, cand_docs: DataFrame, *, top_k: int = TOP_K
) -> DataFrame:
    """(word, n_ref, n_cand, psi) for the top_k words by combined
    count (ties broken by word). Add-one smoothing over the JOINT
    vocabulary keeps ln() finite for one-sided words."""
    def counts(docs: DataFrame, name: str) -> DataFrame:
        return (
            docs.select(F.explode(raw_tokens_column("text")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ref = counts(ref_docs, "n_ref")
    cand = counts(cand_docs, "n_cand")
    joined = ref.join(cand, "word", "full_outer").select(
        "word",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
    )
    totals = joined.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cand").alias("t_cand"),
        F.count(F.lit(1)).alias("vocab"),
    )
    both = joined.crossJoin(F.broadcast(totals))
    p = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + F.col("vocab"))
    q = (F.col("n_cand") + 1).cast("double") / (F.col("t_cand") + F.col("vocab"))
    return (
        both.select(
            "word",
            "n_ref",
            "n_cand",
            (F.col("n_ref") + F.col("n_cand")).alias("_tot"),
            F.round((p - q) * F.log(p / q), 6).alias("psi"),
        )
        .orderBy(F.desc("_tot"), F.asc("word"))
        .limit(top_k)
        .drop("_tot")
    )


# --------------------------------------------------------------- queries

def q_token_psi_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the two md5-halves of documents — the full drift
    machinery on a no-drift baseline (values near 0 by construction)."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    b = hash_bucket(F.col("doc_id"), salt="drift")
    return token_psi(
        docs.filter(b < N_BUCKETS // 2), docs.filter(b >= N_BUCKETS // 2)
    )


QUERIES = {"text_drift_psi": q_token_psi_halves}

_HALF = N_BUCKETS // 2
_BUCKET = (
    "(('0x' || substr(md5('drift' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    f" % {N_BUCKETS})"
)

ORACLES = {
    "text_drift_psi": f"""
        WITH ref AS (
          SELECT word, COUNT(*) AS n_ref FROM (
            SELECT unnest({sql_raw_tokens_expr("text")}) AS word
            FROM documents WHERE {_BUCKET} < {_HALF}
          ) GROUP BY word
        ),
        cand AS (
          SELECT word, COUNT(*) AS n_cand FROM (
            SELECT unnest({sql_raw_tokens_expr("text")}) AS word
            FROM documents WHERE {_BUCKET} >= {_HALF}
          ) GROUP BY word
        ),
        joined AS (
          SELECT COALESCE(ref.word, cand.word) AS word,
                 COALESCE(n_ref, 0) AS n_ref,
                 COALESCE(n_cand, 0) AS n_cand
          FROM ref FULL OUTER JOIN cand ON ref.word = cand.word
        ),
        totals AS (
          SELECT SUM(n_ref) AS t_ref, SUM(n_cand) AS t_cand,
                 COUNT(*) AS vocab
          FROM joined
        )
        SELECT word, CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cand AS BIGINT) AS n_cand,
               round(((n_ref + 1)::DOUBLE / (t_ref + vocab)
                      - (n_cand + 1)::DOUBLE / (t_cand + vocab))
                     * ln(((n_ref + 1)::DOUBLE / (t_ref + vocab))
                          / ((n_cand + 1)::DOUBLE / (t_cand + vocab))),
                     6) AS psi
        FROM joined, totals
        ORDER BY (n_ref + n_cand) DESC, word ASC
        LIMIT {TOP_K}
    """,
}
