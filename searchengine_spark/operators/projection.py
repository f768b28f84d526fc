"""Johnson-Lindenstrauss random projection of embeddings.

Dimensionality reduction for the 100 TB embedding table: a +/-1
(Achlioptas 2003) projection preserves pairwise distances within
1 +/- eps at d' = O(ln n / eps^2) dims, cutting ANN index size and
probe bandwidth ~4x here (64 -> 16) before quantization
(`operators/quantization.py`) cuts another 4x.

Engine-exact by construction, like everything else in this repo's
registry: the projection matrix entry r[i][j] is a SIGN derived from
the md5 convention (bit of h(i, j)), and each output component is an
EXACT decimal sum of sign * float32-value products (float32 -> double
-> decimal(38,12) is lossless; +/-1 products stay exact), rounded
once at the end — no order-dependent float accumulation, so any
partitioning and DuckDB agree to the digit.

Scale shape: one posexplode (n rows x 64) joined to the BROADCAST
64 x 16 sign matrix (generated, tiny), one groupBy (vec_id, out_dim)
with map-side partials. Output is long-form (vec_id, dim, component)
— re-assembly to arrays is a collect_list away when a consumer wants
it; long form is what the verifier can hash stably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import ensure_min_partitions, load_table

OUT_DIMS = 16


def sign_expr(i, j):
    """+/-1 from the repo's md5 convention: parity of the first hex
    nibble of md5('jl:i:j')."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("jl:"), i.cast("string"), F.lit(":"), j.cast("string")
                ).cast("binary")
            ),
            1,
            1,
        ),
        16,
        10,
    ).cast("int")
    return (F.pmod(h, F.lit(2)) * 2 - 1).cast("int")


def sign_matrix(spark: SparkSession, in_dims: int, out_dims: int) -> DataFrame:
    """(i, j, sign) — the deterministic projection matrix."""
    return (
        spark.range(in_dims)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(
            spark.range(out_dims).select(F.col("id").cast("int").alias("j"))
        )
        .select("i", "j", sign_expr(F.col("i"), F.col("j")).alias("sign"))
    )


def project(
    emb: DataFrame,
    *,
    in_dims: int = 64,
    out_dims: int = OUT_DIMS,
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, dim, component): component = round(sum_i sign_ij x_i, 6).

    ``in_dims`` must match the uniform vector width (64 for the
    testdata embeddings); rows explode only up to their own length,
    so a short vector simply contributes fewer terms."""
    spark = emb.sparkSession
    comp = emb.select(
        "vec_id", F.posexplode(F.col(vec_col)).alias("i", "x")
    )
    mat = sign_matrix(spark, in_dims, out_dims)
    return (
        comp.join(F.broadcast(mat), "i")
        .groupBy("vec_id", F.col("j").alias("dim"))
        .agg(
            F.round(
                F.sum(
                    # sign applied by NEGATION, not multiplication:
                    # Spark's decimal*int rule rescales (38,12)x(10,0)
                    # down to scale 6 (precision-loss cap), silently
                    # truncating the terms; negation keeps the scale.
                    F.when(
                        F.col("sign") == 1,
                        F.col("x").cast("double").cast("decimal(38,12)"),
                    ).otherwise(
                        -F.col("x").cast("double").cast("decimal(38,12)")
                    )
                ).cast("double"),
                6,
            ).alias("component")
        )
    )


# --------------------------------------------------------------- queries

def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-row-group parquet would serialize the explode+decimal
    # pipeline on one core (the known tiny-file trap — README)
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    return project(emb)


QUERIES = {"emb_jl_projection": q_jl_projection}

_SIGN_SQL = (
    "(CAST(('0x' || substr(md5('jl:' || CAST(i AS VARCHAR) || ':' "
    "|| CAST(j AS VARCHAR)), 1, 1))::BIGINT % 2 AS INT) * 2 - 1)"
)

ORACLES = {
    "emb_jl_projection": f"""
        WITH comp AS (
          SELECT vec_id,
                 generate_subscripts(embedding, 1) - 1 AS i,
                 unnest(embedding) AS x
          FROM embeddings
        ),
        mat AS (
          SELECT CAST(a.range AS INT) AS i, CAST(b.range AS INT) AS j,
                 {_SIGN_SQL} AS sign
          FROM range(64) a, range({OUT_DIMS}) b
        )
        SELECT c.vec_id, m.j AS dim,
               round(CAST(SUM(CASE WHEN m.sign = 1
                              THEN CAST(CAST(c.x AS DOUBLE) AS DECIMAL(38,12))
                              ELSE -CAST(CAST(c.x AS DOUBLE) AS DECIMAL(38,12))
                              END) AS DOUBLE), 6) AS component
        FROM comp c JOIN mat m ON c.i = m.i
        GROUP BY c.vec_id, m.j
    """,
}
