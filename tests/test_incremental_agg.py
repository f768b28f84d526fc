"""Incremental rollup maintenance == full recompute, through
multi-step appends with group creation and cross-batch user overlap."""

import datetime

import pytest
from pyspark.sql import functions as F

from searchengine_spark.relational.incremental_agg import (
    init_rollup,
    merge_rollup,
    rollup_view,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, h, m), u, t, v)
            for i, (h, m, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


@pytest.fixture(scope="module")
def all_events(spark):
    rows = [
        (9, 5, 1, "view", 1.0),
        (9, 40, 1, "view", 2.5),      # same user, same hour: n_users=1
        (9, 45, 2, "click", 3.0),
        (10, 5, 1, "view", 4.0),      # same user, NEW hour
        (10, 6, 3, "view", 5.25),
        (11, 0, 2, "view", 6.0),      # new hour appears only in batch 3
        (11, 1, 2, "view", 0.75),
    ]
    return _events(spark, rows)


def test_three_step_merge_equals_full(all_events):
    full = (
        all_events.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    state = init_rollup(all_events.filter(F.col("event_id") < 3))
    state = merge_rollup(state, all_events.filter(F.col("event_id").between(3, 4)))
    state = merge_rollup(state, all_events.filter(F.col("event_id") > 4))
    got = sorted(map(tuple, rollup_view(state).collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want


def test_distinct_users_not_double_counted_across_batches(all_events, spark):
    # user 1 is in both the base and the appended batch within hour 9
    state = init_rollup(all_events.filter(F.col("event_id") == 0))
    state = merge_rollup(state, all_events.filter(F.col("event_id") == 1))
    row = [
        r
        for r in rollup_view(state).collect()
        if r["event_type"] == "view"
    ][0]
    assert row["n_events"] == 2 and row["n_users"] == 1
    assert row["total_value"] == pytest.approx(3.5)


def test_empty_batch_is_identity(all_events):
    state = init_rollup(all_events)
    merged = merge_rollup(state, all_events.filter(F.lit(False)))
    assert sorted(map(tuple, rollup_view(merged).collect())) == sorted(
        map(tuple, rollup_view(state).collect())
    )
