"""Streaming top-k leaderboard: cross-batch promotion and retry
idempotence — the two failure modes of ranked-view IVM."""

import os

import pandas as pd
from pyspark.sql import functions as F

from searchengine_spark.streaming.leaderboard import (
    LEADERBOARD_K,
    read_leaderboard,
    start_leaderboard_maintenance,
)


def _events(hours_users: list[tuple[int, int, int]]) -> pd.DataFrame:
    # (hour, user_id, n) -> n event rows in that hour
    rows = []
    eid = 0
    for hour, user, n in hours_users:
        for j in range(n):
            rows.append(
                (
                    eid,
                    pd.Timestamp("2024-01-01")
                    + pd.Timedelta(hours=hour, seconds=j),
                    user,
                    "view",
                    1.0,
                )
            )
            eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def _run(spark, tmp_path, files: list[pd.DataFrame]) -> dict:
    src = str(tmp_path / "events.parquet")
    os.makedirs(src)
    for i, pdf in enumerate(files):
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "lb")
    q = start_leaderboard_maintenance(
        stream, out, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    return out


def test_cross_batch_promotion(spark, tmp_path):
    """A user OUTSIDE the top-k after batch 1 must be promoted once
    batch 2's counts arrive — the case a naive 'keep only the top-k
    rows as state' implementation gets wrong."""
    assert LEADERBOARD_K == 3
    batch1 = _events([(0, 1, 5), (0, 2, 4), (0, 3, 3), (0, 9, 2)])
    batch2 = _events([(0, 9, 9)])  # user 9: 2 + 9 = 11, now rank 1
    out = _run(spark, tmp_path, [batch1, batch2])
    rows = {r["rank"]: r for r in read_leaderboard(spark, out).collect()}
    assert rows[1]["user_id"] == 9 and rows[1]["n_events"] == 11
    assert rows[2]["user_id"] == 1 and rows[3]["user_id"] == 2


def test_ties_break_on_user_id(spark, tmp_path):
    out = _run(spark, tmp_path, [_events([(0, 7, 2), (0, 5, 2), (0, 6, 2)])])
    rows = [
        (r["rank"], r["user_id"])
        for r in read_leaderboard(spark, out).orderBy("rank").collect()
    ]
    assert rows == [(1, 5), (2, 6), (3, 7)]


def test_retry_dedup_prevents_double_count(spark, tmp_path):
    """Simulate an at-least-once redelivery: append the SAME partial
    rows twice under the same (run_id, batch_id) — the read side must
    collapse them."""
    out = _run(spark, tmp_path, [_events([(0, 1, 5), (0, 2, 3)])])
    partials = spark.read.parquet(f"{out}/count_partials")
    partials.write.mode("append").parquet(f"{out}/count_partials")  # replay
    rows = {r["user_id"]: r["n_events"] for r in read_leaderboard(spark, out).collect()}
    assert rows == {1: 5, 2: 3}
