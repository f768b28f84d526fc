"""applyInPandasWithState: final per-user state must equal the batch
ground truth after a full replay."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.streaming.events import read_events_stream
from searchengine_spark.streaming.stateful import user_running_totals


def test_user_running_totals_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    q = (
        user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("user_state_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # update mode may emit several rows per user across batches; the
    # LAST row per user is the final state.
    final = (
        spark.table("user_state_mem")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}

    ev = load_table(spark, sf_dir, "events")
    batch = {
        r.user_id: (r.n, float(r.total))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert set(got) == set(batch)
    for uid, (n, total) in batch.items():
        assert got[uid][0] == n, uid
        assert got[uid][1] == pytest.approx(total, abs=0.01), uid
