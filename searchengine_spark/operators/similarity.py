"""Embedding similarity search (ANN) over array<float> columns.

Baseline: brute-force cosine top-k — a broadcast of the query vector
against a map-side fold over each row's embedding (no shuffle at all
until the final TakeOrderedAndProject). This is the exact-answer
path and scales linearly with the corpus.

Scale path: LSH by random-hyperplane signs (deterministic planes
derived from md5 bits, so results are reproducible anywhere): docs
are bucketed by signature; a query probes only its bucket(s). The
bucketing is a plain groupBy/join on a small key — the same shape as
MinHash-LSH dedup.

All arithmetic folds run in array order (F.aggregate is a sequential
fold), matching DuckDB's list functions for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

QUERY_VEC_ID = 0
TOP_K = 10


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: DataFrame,
    *,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k by cosine; query_vec is a 1-row DF
    (qvec array column). Rounded to 6 for cross-engine determinism."""
    return (
        embeddings.crossJoin(F.broadcast(query_vec))
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# --------------------------------------------------------------- queries

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    return cosine_topk(emb.filter(F.col("vec_id") != QUERY_VEC_ID), qv)


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + dim — the sanity profile of an embedding
    table (map-only)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(norm_expr(F.col("embedding")), 6).alias("l2_norm"),
        "label",
    )


def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean pairwise-to-centroid cosine per label: an embedding-space
    cluster-quality metric. Exercises explode + two-level agg.

    Centroid components are exact DECIMAL sums of float32 values
    (lossless: float32 has <= 17 significant digits in decimal(38,12)
    ... rounded to 9 places both sides), divided by count.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    centroid = comp.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(38,12)")).cast("double") / F.count(F.lit(1)),
            9,
        ).alias("c")
    )
    return centroid.groupBy("label").agg(
        F.count(F.lit(1)).alias("dim"),
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"),
    )


QUERIES = {
    "sim_cosine_topk": q_cosine_topk,
    "sim_embedding_norms": q_embedding_norms,
    "sim_label_centroids": q_label_centroid_sim,
}

_DOT = "list_dot_product(l.e, q.e)"

ORACLES = {
    "sim_cosine_topk": f"""
        WITH q AS (
          SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ),
        l AS (
          SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
          WHERE vec_id <> {QUERY_VEC_ID}
        )
        SELECT vec_id,
               round({_DOT} / (sqrt(list_dot_product(l.e, l.e)) * sqrt(list_dot_product(q.e, q.e))), 6) AS cosine
        FROM l, q
        ORDER BY cosine DESC, vec_id ASC
        LIMIT {TOP_K}
    """,
    "sim_embedding_norms": """
        SELECT vec_id, len(embedding) AS dim,
               round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
               label
        FROM embeddings
    """,
    "sim_label_centroids": """
        WITH comp AS (
          SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
                 unnest(embedding) AS v
          FROM embeddings
        ),
        centroid AS (
          SELECT label, pos,
                 round(CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 9) AS c
          FROM comp GROUP BY label, pos
        )
        SELECT label, COUNT(*) AS dim,
               round(sqrt(SUM(c * c)), 6) AS centroid_norm
        FROM centroid GROUP BY label
    """,
}
