"""Int8 embedding quantization — the storage/bandwidth lever for
vector search at 100 TB (4x smaller than float32, SIMD-friendly
dot products downstream).

Scheme: per-vector symmetric scalar quantization. scale =
max(|x|)/127; q_i = clamp(floor(x_i/scale + 0.5), -127, 127).
`floor(x + 0.5)` instead of round(): round-half rules differ
between engines (Spark HALF_UP vs DuckDB's banker-adjacent
behavior); the floor form is bit-identical everywhere.

Key property (tested): cosine is SCALE-INVARIANT, so similarity
search can run directly on the int8 arrays — the scales cancel —
and only reconstruction needs them.

Everything is a pure map stage over the embeddings scan except the
final top-k (TakeOrderedAndProject) — deliberately NO exchange
barriers here, unlike the tokenize/shingle chains in dedup.py.
Catalyst's CollapseProject does re-inline the scale/qvec expressions
into every lambda element site, but the re-inlined work is plain
arithmetic (~64 flops per site, ~10k per vector total), which is
orders of magnitude cheaper than shuffling the embedding table once,
let alone per stage. Measured at sf0.1: barrier-free is 2x faster
locally and plans 0 Exchanges vs 3. The barrier pattern is for
expensive re-inlined kernels (string tokenize), not cheap ones.

Oracle-checked outputs are scalar metrics and top-k rows (never raw
array columns — cross-engine array-to-pandas representations are
not comparable byte-wise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.similarity import QUERY_VEC_ID, TOP_K, dot_expr

INT8_MAX = 127


def quantize_int8(
    embeddings: DataFrame, *, vec_col: str = "embedding"
) -> DataFrame:
    """Add (scale double, qvec array<int>) to each row; zero vectors
    get scale 0 and an all-zero qvec (guard against 0/0)."""
    with_scale = embeddings.withColumn(
        "scale",
        F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
        / F.lit(float(INT8_MAX)),
    )
    q = F.transform(
        vec_col,
        lambda x: F.least(
            F.greatest(
                F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)),
                F.lit(-INT8_MAX).cast("bigint"),
            ),
            F.lit(INT8_MAX).cast("bigint"),
        ).cast("int"),
    )
    zeros = F.transform(vec_col, lambda x: F.lit(0))
    return with_scale.withColumn(
        "qvec", F.when(F.col("scale") > 0, q).otherwise(zeros)
    )


def q_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector reconstruction quality: max absolute error (bounded
    by scale/2 — asserted in tests) and cosine(original,
    dequantized)."""
    emb = load_table(spark, sf_dir, "embeddings")
    quant = quantize_int8(emb)
    deq = F.zip_with(
        "qvec", "embedding", lambda q, _: q.cast("double") * F.col("scale")
    )
    with_deq = quant.withColumn("deq", deq)
    err = F.array_max(
        F.zip_with("embedding", "deq", lambda x, d: F.abs(x.cast("double") - d))
    )
    cos = dot_expr(F.col("embedding"), F.col("deq")) / (
        F.sqrt(dot_expr(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot_expr(F.col("deq"), F.col("deq")))
    )
    # Zero vector => both norms are 0: Spark's 0/0 yields NULL while
    # DuckDB's IEEE float div yields NaN. Gate on scale > 0 (exactly
    # the zero-vector condition) so both engines emit NULL.
    cos = F.when(F.col("scale") > 0, cos)
    return with_deq.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.round(err, 9).alias("max_abs_err"),
        F.round(cos, 6).alias("cos_orig_deq"),
    )


def q_int8_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the int8-quantized vectors —
    scales cancel in cosine, so this never touches float embeddings
    after quantization. The serving path for a 4x-compressed corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    quant = quantize_int8(emb).select("vec_id", "qvec")
    qv = quant.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("qvec").alias("query_q")
    )
    # Same zero-vector NULL-vs-NaN guard as q_quantization_error; an
    # all-zero qvec has dot(qvec, qvec) == 0.
    cos = F.when(
        dot_expr(F.col("qvec"), F.col("qvec")) > 0,
        dot_expr(F.col("qvec"), F.col("query_q"))
        / (
            F.sqrt(dot_expr(F.col("qvec"), F.col("qvec")))
            * F.sqrt(dot_expr(F.col("query_q"), F.col("query_q")))
        ),
    )
    return (
        quant.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", F.round(cos, 6).alias("cosine_q"))
        .orderBy(F.desc_nulls_last("cosine_q"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# DuckDB twin of the quantized-vector expression (INT list).
_SCALE_SQL = "list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0"
_QVEC_SQL = (
    "CASE WHEN scale > 0 THEN "
    "list_transform(embedding::DOUBLE[], "
    "x -> least(greatest(floor(x / scale + 0.5), -127), 127)::INT) "
    "ELSE list_transform(embedding, x -> 0) END"
)

QUERIES = {
    "emb_quantization_error": q_quantization_error,
    "emb_int8_cosine_topk": q_int8_cosine_topk,
}

ORACLES = {
    "emb_quantization_error": f"""
        WITH s AS (
          SELECT vec_id, embedding, {_SCALE_SQL} AS scale FROM embeddings
        ), qd AS (
          SELECT vec_id, embedding, scale, {_QVEC_SQL} AS qvec FROM s
        ), dq AS (
          SELECT vec_id, embedding, scale,
                 list_transform(qvec, q -> q * scale) AS deq
          FROM qd
        )
        SELECT vec_id,
               round(scale, 9) AS scale,
               round(list_max(list_transform(range(1, len(embedding) + 1),
                     i -> abs(embedding[i]::DOUBLE - deq[i]))), 9) AS max_abs_err,
               round(CASE WHEN scale > 0 THEN
                     list_dot_product(embedding::DOUBLE[], deq)
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product(deq, deq))) END, 6) AS cos_orig_deq
        FROM dq
    """,
    "emb_int8_cosine_topk": f"""
        WITH s AS (
          SELECT vec_id, embedding, {_SCALE_SQL} AS scale FROM embeddings
        ), qd AS (
          SELECT vec_id, ({_QVEC_SQL})::DOUBLE[] AS qvec FROM s
        ), qv AS (
          SELECT qvec AS query_q FROM qd WHERE vec_id = {QUERY_VEC_ID}
        )
        SELECT l.vec_id,
               round(CASE WHEN list_dot_product(l.qvec, l.qvec) > 0 THEN
                     list_dot_product(l.qvec, qv.query_q)
                     / (sqrt(list_dot_product(l.qvec, l.qvec))
                        * sqrt(list_dot_product(qv.query_q, qv.query_q))) END,
                     6) AS cosine_q
        FROM qd l, qv
        WHERE l.vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine_q DESC NULLS LAST, vec_id ASC
        LIMIT {TOP_K}
    """,
}
