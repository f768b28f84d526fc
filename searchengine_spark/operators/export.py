"""Training-set export: deterministic global shuffle, exact global
row index, and fixed-size shard assignment — WITHOUT a global sort.

The last mile of a data pipeline hands the trainer (a) a
reproducible row ORDER (training-order shuffling must be
deterministic for resumable jobs and ablation parity) and (b)
fixed-size SHARDS (webdataset/tfrecord convention: equal-row files
the loader can stripe across workers). Both need an exact global row
index, and the naive way — one unpartitioned row_number window — is
a single-task sort of the whole table.

This module reuses the distributed prefix-sum shape from
`operators/sampling.weighted_pps_sample` with weight==1:

  1. hash-bucket every row by id (content-derived: the bucket order
     IS the deterministic shuffle — uncorrelated with scan order,
     stable across runs and repartitionings);
  2. per-bucket counts (one small agg, N_BUCKETS rows);
  3. exclusive offsets over the bucket totals (a window over 10^4
     rows — the only single-partition step, constant-size at any
     data scale);
  4. broadcast offsets back; within-bucket row_number shuffles on
     the bucket key only.

global index = bucket offset + within-bucket rank, equivalent to
ROW_NUMBER() OVER (ORDER BY bucket, id) — which is exactly what the
DuckDB oracle states. shard = index DIV rows_per_shard.

The reference engine exports by writing one file from a single
process (no sharding contract at all); this is the scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.operators.sampling import hash_bucket

ROWS_PER_SHARD = 64


def global_shuffle_index(
    df: DataFrame, id_col: str, *, salt: str = "shuf"
) -> DataFrame:
    """Add `gidx` — the row's exact position in the deterministic
    hash-shuffled global order — via the distributed prefix sum (no
    global sort; the only single-partition step is over bucket
    totals)."""
    from pyspark.sql import Window

    rows = df.withColumn("_b", hash_bucket(F.col(id_col), salt=salt))
    totals = rows.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    off_win = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_win), F.lit(0))
    ).select("_b", "_off")
    in_win = Window.partitionBy("_b").orderBy(F.col(id_col))
    return (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            "gidx", (F.col("_off") + F.row_number().over(in_win) - 1).cast("bigint")
        )
        .drop("_b", "_off")
    )


def shard_assignments(
    df: DataFrame,
    id_col: str,
    *,
    rows_per_shard: int = ROWS_PER_SHARD,
    salt: str = "shuf",
) -> DataFrame:
    """`gidx` plus the fixed-size shard it lands in: every shard has
    exactly ``rows_per_shard`` rows except the last."""
    return global_shuffle_index(df, id_col, salt=salt).withColumn(
        "shard", (F.col("gidx") / rows_per_shard).cast("bigint")
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    *,
    rows_per_shard: int = ROWS_PER_SHARD,
    salt: str = "shuf",
) -> dict[int, int]:
    """Materialize fixed-size shards: one parquet directory per
    shard, each holding one file (the shard fits a task by
    construction — that's the point of bounding rows_per_shard).
    Returns {shard: n_rows} read back from the written files — the
    export manifest a loader stripes over."""
    assigned = shard_assignments(
        df, id_col, rows_per_shard=rows_per_shard, salt=salt
    )
    (
        assigned.repartition("shard")
        .sortWithinPartitions("shard", "gidx")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    out = spark.read.parquet(path)
    return {
        int(r["shard"]): int(r["n"])
        for r in out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }


# --------------------------------------------------------------- queries


def q_export_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-shuffle shard assignment over documents: the
    prefix-sum global index must equal ROW_NUMBER over the hashed
    order (the oracle's formulation) — any off-by-one in the offsets
    or a nondeterministic within-bucket order breaks the hash."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shard_assignments(docs, "doc_id").orderBy("gidx")


_SHARD_SQL = f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 10000 AS b
      FROM documents
    ), r AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b, doc_id) - 1 AS gidx FROM h
    )
    SELECT doc_id, CAST(gidx AS BIGINT) AS gidx,
           CAST(gidx // {ROWS_PER_SHARD} AS BIGINT) AS shard
    FROM r
    ORDER BY gidx
"""


QUERIES = {"export_shard_assignment": q_export_shard_assignment}
ORACLES = {"export_shard_assignment": _SHARD_SQL}
