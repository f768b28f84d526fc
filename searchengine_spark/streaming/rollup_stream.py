"""Streaming materialized rollup: the IVM of relational/
incremental_agg.py driven by Structured Streaming.

Topology (same proven shape as streaming/index_stream.py): each
micro-batch appends its COMPACT partial state — per-group counts and
DECIMAL sums, plus the distinct (group, user) companion keys — as
parquet; the queryable rollup is derived read-side by merging
partials. Nothing is read-modify-written, so there is no
read-overwrite cycle and no state-store to size.

Exactly-once under at-least-once foreachBatch: a retried batch
re-appends the SAME deterministic partials under the SAME batch_id,
and the read side deduplicates — group partials by
(batch_id, group) rows (identical on retry), user keys by the key
itself. Retries therefore cannot double-count.

At 100 TB/day the partials stay tiny (one row per group per batch,
one row per new (group, user) key); a periodic compaction can fold
old partials into one, exactly like index_stream's compaction — the
read-side merge is already that fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.relational.incremental_agg import _GROUP_COLS, _batch_state


def start_rollup_maintenance(
    events_stream: DataFrame,
    out_dir: str,
    *,
    checkpoint_dir: str | None = None,
):
    """Start the maintenance query; returns the StreamingQuery.

    Partials are stamped (run_id, batch_id) so the read-side dedup
    never confuses DISTINCT maintenance runs with retries: batch ids
    restart at 0 per run, and two runs into the same out_dir would
    otherwise collide and silently drop the second run's data. With
    a checkpoint the run identity IS the checkpoint (a restarted
    query re-delivers a failed batch under the same batch_id and
    must dedup against the pre-crash append); without one, each
    start is an independent run.
    """
    import hashlib
    import uuid

    if checkpoint_dir:
        run_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:16]
    else:
        run_id = uuid.uuid4().hex[:16]

    def update_batch(batch_df: DataFrame, batch_id: int) -> None:
        state = _batch_state(batch_df)
        (
            state.groups.withColumn("batch_id", F.lit(batch_id))
            .withColumn("run_id", F.lit(run_id))
            .write.mode("append")
            .parquet(f"{out_dir}/group_partials")
        )
        state.user_keys.write.mode("append").parquet(f"{out_dir}/user_keys")

    writer = events_stream.writeStream.foreachBatch(update_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge the appended partials into the batch rollup's schema."""
    gcols = list(_GROUP_COLS)
    partials = (
        spark.read.parquet(f"{out_dir}/group_partials")
        # retry-dedup: identical rows per (run, batch, group) collapse
        .dropDuplicates(["run_id", "batch_id", *gcols])
    )
    groups = partials.groupBy(*gcols).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value_dec").cast("decimal(28,2)").alias("total_value_dec"),
    )
    n_users = (
        spark.read.parquet(f"{out_dir}/user_keys")
        .dropDuplicates([*gcols, "user_id"])
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return groups.join(n_users, gcols).select(
        *gcols,
        "n_events",
        F.col("total_value_dec").cast("double").alias("total_value"),
        "n_users",
    )
