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


SHARD_BYTE_BUDGET = 4096


def byte_budget_shards(
    df: DataFrame,
    id_col: str,
    bytes_col,
    *,
    budget: int = SHARD_BYTE_BUDGET,
    salt: str = "shuf",
) -> DataFrame:
    """(id, n_bytes, shard_id): greedy byte-budget packing in the
    deterministic shuffled order — the webdataset/tar convention
    where shards target a BYTE size (sequential-read granularity for
    the loader), not a row count, because document sizes vary.

    Same two-level distributed prefix sum as global_shuffle_index,
    weighted by bytes instead of 1: per-bucket byte totals ->
    constant-size exclusive-offset window -> broadcast back ->
    within-bucket running sum. shard_id = cum_bytes_before // budget
    (greedy fill: a document is assigned by its start offset, so a
    shard may overshoot by at most one document — the standard
    contract). Shares the 'shuf' salt with the row-count sharding so
    both layouts agree on the global order."""
    from pyspark.sql import Window

    rows = df.withColumn("_b", hash_bucket(F.col(id_col), salt=salt))
    totals = rows.groupBy("_b").agg(F.sum(bytes_col).alias("_n"))
    off_win = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_win), F.lit(0))
    ).select("_b", "_off")
    in_win = (
        Window.partitionBy("_b")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_cumb",
            F.col("_off") + F.coalesce(F.sum(bytes_col).over(in_win), F.lit(0)),
        )
        .select(
            id_col,
            F.col(bytes_col).cast("bigint").alias("n_bytes"),
            F.expr(f"CAST(_cumb DIV {budget} AS BIGINT)").alias("shard_id"),
        )
    )


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


def q_export_byte_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget packing over documents (weight = length(text)):
    the distributed weighted prefix sum must equal the running-sum
    window the oracle states — a lost byte, a wrong offset, or an
    unstable within-bucket order all shift every later shard id."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("_bytes")
    )
    return byte_budget_shards(docs, "doc_id", "_bytes").orderBy("doc_id")


_BYTE_SHARD_SQL = f"""
    WITH h AS (
      SELECT doc_id, length(text) AS n_bytes,
             ('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 10000 AS b
      FROM documents
    ), r AS (
      SELECT doc_id, n_bytes,
             COALESCE(SUM(n_bytes) OVER (
               ORDER BY b, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cumb
      FROM h
    )
    SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(cumb // {SHARD_BYTE_BUDGET} AS BIGINT) AS shard_id
    FROM r
    ORDER BY doc_id
"""


QUERIES = {
    "export_shard_assignment": q_export_shard_assignment,
    "export_byte_budget_shards": q_export_byte_budget_shards,
}
ORACLES = {
    "export_shard_assignment": _SHARD_SQL,
    "export_byte_budget_shards": _BYTE_SHARD_SQL,
}
