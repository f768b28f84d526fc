"""Streaming rollup maintenance: replay the events table through the
foreachBatch IVM and compare against the batch rollup."""

from pyspark.sql import functions as F

from searchengine_spark.streaming.events import read_events_stream
from searchengine_spark.streaming.rollup_stream import (
    read_rollup,
    start_rollup_maintenance,
)


def _batch_rollup(spark, sf_dir):
    from searchengine_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def test_streamed_rollup_equals_batch(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    q = start_rollup_maintenance(stream, out, checkpoint_dir=ckpt)
    q.awaitTermination()

    got = sorted(map(tuple, read_rollup(spark, out).collect()))
    want = sorted(map(tuple, _batch_rollup(spark, sf_dir).collect()))
    assert got == want


def test_replayed_batch_does_not_double_count(spark, sf_dir, tmp_path):
    """Simulate an at-least-once retry: append one micro-batch's
    partials twice under the same batch_id; the read side must
    produce the same rollup."""
    from searchengine_spark.io import load_table
    from searchengine_spark.relational.incremental_agg import _batch_state

    out = str(tmp_path / "state")
    ev = load_table(spark, sf_dir, "events")
    state = _batch_state(ev)
    for _ in range(2):  # the "retry": same run, same batch id
        (
            state.groups.withColumn("batch_id", F.lit(7))
            .withColumn("run_id", F.lit("run-a"))
            .write.mode("append")
            .parquet(f"{out}/group_partials")
        )
        state.user_keys.write.mode("append").parquet(f"{out}/user_keys")

    got = sorted(map(tuple, read_rollup(spark, out).collect()))
    want = sorted(map(tuple, _batch_rollup(spark, sf_dir).collect()))
    assert got == want


def test_second_maintenance_run_is_not_swallowed(spark, tmp_path):
    """Two DISTINCT runs into the same state dir (batch ids both
    restart at 0) must both count — the run_id stamp keeps the
    retry-dedup from eating the second run's partials."""
    import datetime

    from searchengine_spark.streaming.rollup_stream import (
        start_rollup_maintenance,
    )

    out = str(tmp_path / "state")
    src = tmp_path / "src"
    src.mkdir()

    def write_events(name, ids):
        spark.createDataFrame(
            [
                (i, datetime.datetime(2024, 1, 1, 9, 0), i, "view", 1.0)
                for i in ids
            ],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        ).write.mode("overwrite").parquet(str(src / name))

    for rn, ids in (("a", [1, 2]), ("b", [3])):
        write_events(rn, ids)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double"
            )
            .parquet(str(src / rn))
        )
        q = start_rollup_maintenance(stream, out)  # no checkpoint: new run
        q.awaitTermination()

    row = read_rollup(spark, out).collect()[0]
    assert row["n_events"] == 3 and row["n_users"] == 3
