"""Hash-provable top principal direction via integer power iteration.

The embedding-space twin of `operators/graph.py` (PageRank) and
`operators/kmeans.py` (Lloyd): an ITERATIVE linear-algebra routine
whose every step is exact integer arithmetic, so the driver's
value-hash compare proves the whole training loop against an
unrolled-CTE DuckDB oracle — no float tolerance, no rows-only cop-out.

What it computes: the dominant eigenvector of the (uncentered)
second-moment matrix S = sum_rows q qT over FP_SCALE-quantized
embeddings (kmeans.py's quantization, same constant). The top
direction of S is the classic one-pass sketch of where the embedding
mass points — used for whitening checks, anisotropy diagnostics
("all my embeddings share a rogue dominant direction" is a real
embedding-quality failure), and as the first step of range-finder
style randomized PCA.

Power iteration, 3 unrolled rounds from the all-ones start:
    w = S v;   v' = w div (max|w| div VSCALE)
The renormalization is INTEGER: dividing by (m div VSCALE) keeps
|v| ~ VSCALE with truncating division — Spark's `div` and DuckDB's
`//` both truncate toward zero, verified on negative operands.

Overflow audit (int64 end-to-end at test scales): |q| <= ~1e4 so
S_ij <= 1e8 * n_rows (~5e11 at sf0.1x5); |v| <= ~VSCALE=1e3;
|w| <= 64 * S_max * VSCALE ~ 3e16 < 2^63. At 1e9+ rows S outgrows
int64 — switch S and w to decimal(38,0)/HUGEINT (same expressions;
the div-based renorm keeps v itself in int64 forever).

Scale shape: S is a posexplode self-join per row (d^2 = 4096
products per row, map-side partial-aggregated down to 4096 keys
before the shuffle — the shuffle carries per-task partials, not
rows). Each iteration is a 4096-row matrix against a 64-row vector:
driver-scale. At 100 TB only the ONE S-building pass touches the
data; the iterations are free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.kmeans import FP_SCALE

VSCALE = 1_000
ITERS = 3


def second_moment_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, s): S = sum q qT over quantized vectors, exact int64."""
    q = emb.select(
        F.col("vec_id"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * FP_SCALE + F.lit(0.5)).cast(
                    "bigint"
                ),
            )
        ).alias("i", "qi"),
    )
    a, b = q.alias("a"), q.alias("b")
    return (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.qi") * F.col("b.qi")).alias("s"))
    )


def top_direction(smat: DataFrame, dim: int, *, iters: int = ITERS) -> DataFrame:
    """(pos, v) — dominant eigendirection at scale ~VSCALE after
    ``iters`` integer power-method rounds from the all-ones start."""
    spark = smat.sparkSession
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("i"), F.lit(VSCALE).cast("bigint").alias("v")
    )
    smat = smat.persist()
    try:
        for _ in range(iters):
            w = (
                smat.join(v.withColumnRenamed("i", "j"), "j")
                .groupBy("i")
                .agg(F.sum(F.col("s") * F.col("v")).alias("w"))
            )
            m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
            # greatest(..., 1): a degenerate all-zero S would otherwise
            # divide by zero (ANSI error); real data never hits it.
            v = (
                w.crossJoin(F.broadcast(m))
                .select(
                    "i",
                    F.expr(f"w div greatest(m div {VSCALE}, 1)")
                    .cast("bigint")
                    .alias("v"),
                )
            )
        return v.select(F.col("i").alias("pos"), "v")
    finally:
        smat.unpersist()


# --------------------------------------------------------------- queries

DIM = 64


def q_pca_top_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return top_direction(second_moment_matrix(emb), DIM)


QUERIES = {"emb_pca_top_direction": q_pca_top_direction}


def _round_sql(prev_v: str, idx: int) -> str:
    return f"""
        w{idx} AS (
          SELECT s.i, CAST(SUM(s.s * {prev_v}.v) AS BIGINT) AS w
          FROM s JOIN {prev_v} ON s.j = {prev_v}.i GROUP BY s.i
        ),
        m{idx} AS (SELECT MAX(ABS(w)) AS m FROM w{idx}),
        v{idx} AS (
          SELECT w{idx}.i, w // greatest(m // {VSCALE}, 1) AS v
          FROM w{idx}, m{idx}
        )"""


ORACLES = {
    "emb_pca_top_direction": f"""
        WITH q AS (
          SELECT vec_id,
                 generate_subscripts(embedding, 1) - 1 AS i,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {FP_SCALE} + 0.5)
                      AS BIGINT) AS qi
          FROM embeddings
        ),
        s AS (
          SELECT a.i AS i, b.i AS j, CAST(SUM(a.qi * b.qi) AS BIGINT) AS s
          FROM q a JOIN q b ON a.vec_id = b.vec_id
          GROUP BY a.i, b.i
        ),
        v0 AS (
          SELECT CAST(k.range AS INT) AS i, CAST({VSCALE} AS BIGINT) AS v
          FROM range({DIM}) k
        ),{_round_sql("v0", 1)},{_round_sql("v1", 2)},{_round_sql("v2", 3)}
        SELECT CAST(i AS INT) AS pos, CAST(v AS BIGINT) AS v FROM v3
    """,
}
