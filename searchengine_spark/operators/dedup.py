"""Deduplication operators for large-corpus curation.

Three families, all shuffle-on-hash (the only scalable shape):

- exact: md5 of the raw text; groupBy hash. One shuffle keyed by a
  uniformly distributed 128-bit hash — no skew by construction.
- near-dup via MinHash + LSH banding: shingle -> per-hash-function
  min -> band signatures -> candidates join on (band, band_hash).
  At 100 TB, candidate generation is a self-equi-join on band_hash
  (uniform key), NOT an O(n^2) cross join.
- SimHash (in simhash_bits/q via md5 bit votes) for
  Hamming-style near-dup on token multisets.

Determinism: every hash is md5 over explicit strings, so Spark and
DuckDB agree bit-for-bit — the whole MinHash/LSH path is
oracle-checkable SQL, no RNG involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.text.tokenizer import sql_tokens_expr, tokens_column

NUM_HASHES = 16
BAND_SIZE = 4  # -> 4 bands
SHINGLE_K = 3


def exact_dedup_groups(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Group identical texts; emit hash, copy count, canonical id."""
    return (
        docs.select(
            F.md5(F.col(text_col).cast("binary")).alias("text_hash"), "doc_id"
        )
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def shingles_column(tokens: Column, k: int = SHINGLE_K) -> Column:
    """k-token shingles as space-joined strings (array Column)."""
    return F.transform(
        F.sequence(F.lit(0), F.size(tokens) - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j + 1) for j in range(k)]
        ),
    )


def minhash_signature_cols(shingles: Column, num_hashes: int = NUM_HASHES) -> list[Column]:
    """num_hashes MinHash values; hash_i(s) = md5('<i>:' || s).

    Salted md5 gives an independent-enough hash family and — unlike
    xxhash/murmur seeds — is reproducible in any SQL engine.
    """

    def salted(i: int):
        # NB: must be a ONE-argument lambda — F.transform treats a
        # second lambda parameter as the array index.
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s).cast("binary"))

    return [
        F.array_min(F.transform(shingles, salted(i))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]


def minhash_bands(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(doc_id, band, band_hash) — LSH bucketing table.

    Docs with fewer than SHINGLE_K tokens are excluded (no shingle).
    """
    toks = tokens_column(text_col)
    with_sig = (
        docs.select(F.col("doc_id"), shingles_column(toks).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .select("doc_id", *minhash_signature_cols(F.col("shingles"), num_hashes))
    )
    n_bands = num_hashes // band_size
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
                ).cast("binary")
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ]
    return with_sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def neardup_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Self-join on (band, band_hash): the LSH candidate generation.

    At scale this is an equi-join on a uniform 128-bit key — the
    shuffle is balanced, and no pair outside a shared bucket is ever
    materialized. Output: distinct (doc_a < doc_b) pairs.
    """
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, pairs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (verification stage).

    Joins the (small) candidate set back to per-doc shingle sets;
    array_intersect/union are per-row ops — no extra shuffle beyond
    the two joins.
    """
    sh = docs.select(
        "doc_id",
        F.array_distinct(shingles_column(tokens_column(text_col))).alias("sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------------- queries

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_bands(load_table(spark, sf_dir, "documents"))


def q_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return neardup_candidate_pairs(minhash_bands(docs))


def q_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = neardup_candidate_pairs(minhash_bands(docs))
    return jaccard_pairs(docs, pairs)


# ------------------------------------------------------------- oracles

def _sig_sql_cols(num_hashes: int = NUM_HASHES) -> str:
    return ",\n         ".join(
        "list_aggregate(list_transform(shingles, s -> md5('{i}:' || s)), 'min')"
        " AS sig_{i}".format(i=i)
        for i in range(num_hashes)
    )


def _bands_sql(num_hashes: int = NUM_HASHES, band_size: int = BAND_SIZE) -> str:
    toks = sql_tokens_expr("text")
    n_bands = num_hashes // band_size
    band_rows = ",\n    ".join(
        "({b}, md5({concat}))".format(
            b=b,
            concat=" || '|' || ".join(
                f"sig_{b * band_size + j}" for j in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_transform(range(1, len(t) - {SHINGLE_K - 2}),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS shingles
  FROM toks WHERE len(t) >= {SHINGLE_K}
),
sig AS (
  SELECT doc_id,
         {_sig_sql_cols(num_hashes)}
  FROM sh
),
bands AS (
  SELECT doc_id, b.band, b.band_hash
  FROM sig, LATERAL (VALUES
    {band_rows}
  ) AS b(band, band_hash)
)
"""


_BANDS_CTE = _bands_sql()

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_bands": q_minhash_bands,
    "dedup_neardup_pairs": q_neardup_pairs,
    "dedup_neardup_jaccard": q_neardup_jaccard,
}

ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
               MIN(doc_id) AS canonical_doc_id
        FROM documents GROUP BY md5(text)
    """,
    "dedup_minhash_bands": f"{_BANDS_CTE} SELECT doc_id, band, band_hash FROM bands",
    "dedup_neardup_pairs": f"""{_BANDS_CTE}
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.band_hash = r.band_hash
         AND l.doc_id < r.doc_id
    """,
    "dedup_neardup_jaccard": f"""{_BANDS_CTE},
        pairs AS (
          SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
          FROM bands l JOIN bands r
            ON l.band = r.band AND l.band_hash = r.band_hash
           AND l.doc_id < r.doc_id
        ),
        shsets AS (
          SELECT doc_id, list_distinct(shingles) AS shset FROM sh
        )
        SELECT doc_a, doc_b,
               round(len(list_intersect(a.shset, b.shset))
                     / len(list_distinct(list_concat(a.shset, b.shset))), 6) AS jaccard
        FROM pairs
        JOIN shsets a ON a.doc_id = doc_a
        JOIN shsets b ON b.doc_id = doc_b
    """,
}
