"""Aggregate-navigator query rewrite: answer coarse-grain rollup
queries from a finer-grain MATERIALIZED rollup instead of the base
fact table.

The classic warehouse trade (Gray et al., "Data Cube", 1997; every
lakehouse's materialized-view rewrite today): a daily-grain query
over a 100 TB events table should not rescan events when an
hourly-grain materialization (here the IVM-maintained rollup of
relational/incremental_agg.py) already exists — re-aggregating
~10^5 hourly rows costs nothing next to the base scan.

What makes the rewrite non-trivial is the aggregate algebra:

- DISTRIBUTIVE aggregates (count, sum, min, max) compose — daily
  n_events is the sum of hourly n_events. Pure groupBy over the
  materialization.
- COUNT DISTINCT is NOT distributive: summing hourly n_users
  double-counts users active in several hours of a day. The correct
  rewrite pulls from the rollup's companion KEY VIEW (the distinct
  (window, type, user) tuples the IVM state already maintains for
  exactly this reason) and re-distincts at day grain — still
  ~|distinct keys| work, never a base-table scan.

The driver hash-checks this rewrite against the base-table daily
aggregation stated directly in SQL — equality proves the navigator
is lossless, including the non-distributive path.

Extends the reference's single-grain aggregation surface (reference
polarssearchengine.ipynb group_by cells) with the multi-grain
materialization reuse a 100 TB deployment needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_micros, exact_floor_div
from searchengine_spark.io import load_table
from searchengine_spark.relational.incremental_agg import (
    RollupState,
    init_rollup,
)

_SEC_PER_DAY = 86_400


def _day_idx(df: DataFrame, col: str) -> Column:
    sec = exact_floor_div(event_time_micros(df, col), 1_000_000)
    return exact_floor_div(sec, _SEC_PER_DAY).cast("bigint")


def daily_from_hourly(state: RollupState) -> DataFrame:
    """Rewrite the daily rollup against the hourly materialization:
    distributive parts re-aggregate from `groups`, the distinct-user
    part re-distincts the companion `user_keys` at day grain."""
    g = state.groups.withColumn("day_idx", _day_idx(state.groups, "window_start"))
    daily = g.groupBy("day_idx", "event_type").agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("total_value_dec").cast("decimal(28,2)").alias("_v"),
    )
    uk = state.user_keys.withColumn(
        "day_idx", _day_idx(state.user_keys, "window_start")
    )
    daily_users = (
        uk.select("day_idx", "event_type", "user_id")
        .distinct()
        .groupBy("day_idx", "event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return daily.join(daily_users, ["day_idx", "event_type"]).select(
        "day_idx",
        "event_type",
        "n_events",
        F.col("_v").cast("double").alias("total_value"),
        "n_users",
    )


def q_rollup_rewrite_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type stats answered from the HOURLY materialization
    (never the base table); the oracle aggregates the base table
    directly — hash equality proves the rewrite lossless."""
    state = init_rollup(load_table(spark, sf_dir, "events"))
    return daily_from_hourly(state)


QUERIES = {"events_rollup_rewrite_daily": q_rollup_rewrite_daily}

ORACLES = {
    # Direct base-table daily aggregation — deliberately NOT the
    # rewrite's shape, so the hash match proves grain-navigation
    # correctness end to end (same decimal(28,2) accumulation as the
    # hourly rollup before the final double cast).
    "events_rollup_rewrite_daily": f"""
        WITH e AS (
          SELECT CAST((epoch_us(ts) // 1000000) // {_SEC_PER_DAY} AS BIGINT)
                   AS day_idx,
                 event_type,
                 user_id,
                 CAST(value AS DECIMAL(28,2)) AS v
          FROM events
        )
        SELECT day_idx,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(CAST(SUM(v) AS DECIMAL(28,2)) AS DOUBLE) AS total_value,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM e
        GROUP BY day_idx, event_type
    """,
}
