"""Streaming top-k leaderboard: incremental maintenance of a RANKED
view from Structured Streaming.

Maintaining a top-k view incrementally is the classically hard IVM
case — a later batch can promote any key, so the k visible rows are
not a function of the previous k visible rows. The scale-correct
split (same shape as rollup_stream.py): the STREAM maintains the
sufficient statistics — per-(hour, user) event counts, appended as
compact per-batch partials, insert-only and retry-deduped — and the
ranked view is derived from the merged counts at read time with the
audited bucket-prefix-sum rank (max_rank=K prunes every bucket past
the K-th row BEFORE the window, so the rank step is O(hours * K),
not a per-hour sort of all users).

Exactly-once under at-least-once foreachBatch: a retried batch
re-appends IDENTICAL deterministic partial rows under the same
(run_id, batch_id), and the read side collapses them by
(run_id, batch_id, hour, user) before summing — retries cannot
double-count (the rollup_stream.py convention).

At 100 TB/day the partials are one row per (hour, user) per batch;
the counts merge is one keyed sum and the leaderboard never
materializes more than hours x K rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_seconds, exact_floor_div

LEADERBOARD_K = 3


def start_leaderboard_maintenance(
    events_stream: DataFrame,
    out_dir: str,
    *,
    checkpoint_dir: str | None = None,
):
    """Start the maintenance query; returns the StreamingQuery."""
    import hashlib
    import uuid

    if checkpoint_dir:
        run_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:16]
    else:
        run_id = uuid.uuid4().hex[:16]

    def update_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(
                exact_floor_div(event_time_seconds(batch_df, "ts"), 3600).alias(
                    "hour_idx"
                ),
                "user_id",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
            .withColumn("run_id", F.lit(run_id))
            .write.mode("append")
            .parquet(f"{out_dir}/count_partials")
        )

    writer = events_stream.writeStream.foreachBatch(update_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_leaderboard(
    spark: SparkSession, out_dir: str, *, k: int = LEADERBOARD_K
) -> DataFrame:
    """(hour_idx, rank, user_id, n_events): the top-k users per hour
    from the maintained partials. Ties break on user_id ascending so
    the leaderboard is input-determined."""
    from searchengine_spark.operators.distrank import distributed_rank, range_bucket

    counts = (
        spark.read.parquet(f"{out_dir}/count_partials")
        # retry-dedup: identical rows per (run, batch, key) collapse
        .dropDuplicates(["run_id", "batch_id", "hour_idx", "user_id"])
        .groupBy("hour_idx", "user_id")
        .agg(F.sum("n").alias("n_events"))
    )
    ext, bucket = range_bucket(counts, "n_events", descending=True)
    ranked = distributed_rank(
        ext,
        ["hour_idx"],
        [F.desc("n_events"), F.asc("user_id")],
        bucket,
        rank_name="rank",
        max_rank=k,
    )
    return ranked.filter(F.col("rank") <= F.lit(k)).select(
        "hour_idx", F.col("rank").cast("bigint").alias("rank"), "user_id", "n_events"
    )
