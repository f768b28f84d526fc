"""Aggregate-navigator rewrite (relational/rollup_rewrite.py): daily
answers derived from the hourly materialization must equal the direct
base-table aggregation, including the non-distributive distinct-user
path."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.relational import rollup_rewrite as rr
from searchengine_spark.relational.incremental_agg import init_rollup
from tests.helpers import assert_matches_oracle


def test_daily_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        rr.q_rollup_rewrite_daily(spark, sf_dir),
        rr.ORACLES["events_rollup_rewrite_daily"],
        sf_dir,
        name="events_rollup_rewrite_daily",
    )


def test_distinct_users_not_summed(spark, sf_dir):
    """The naive (wrong) rewrite — summing hourly n_users — must
    exceed the correct daily distinct wherever a user is active in
    more than one hour of a day; the navigator must match the exact
    count, not the sum."""
    ev = load_table(spark, sf_dir, "events")
    state = init_rollup(ev)
    got = rr.daily_from_hourly(state)

    hourly_users = state.user_keys.groupBy("window_start", "event_type").agg(
        F.count(F.lit(1)).alias("n_users_h")
    )
    hourly_users = hourly_users.withColumn(
        "day_idx", rr._day_idx(hourly_users, "window_start")
    )
    naive = hourly_users.groupBy("day_idx", "event_type").agg(
        F.sum("n_users_h").alias("n_users_naive")
    )
    cmp = got.join(naive, ["day_idx", "event_type"]).agg(
        F.sum((F.col("n_users_naive") < F.col("n_users")).cast("int")).alias(
            "under"
        ),
        F.sum((F.col("n_users_naive") > F.col("n_users")).cast("int")).alias(
            "over"
        ),
    ).collect()[0]
    # naive can never undercount, and on this data it must overcount
    # somewhere (users with >1 active hour per day exist)
    assert cmp["under"] == 0
    assert cmp["over"] > 0
