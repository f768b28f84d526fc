"""Incremental maintenance of a materialized aggregate (rollup IVM).

The batch engine's hourly rollup (relational/events.py
q_events_hourly) recomputes from raw events. At 100 TB the rollup is
a materialized view over an append-only fact stream and each new
batch should cost O(batch + |affected groups|), not O(corpus). This
module maintains it with the classic incremental-view-maintenance
decomposition:

- ``n_events`` / ``total_value``: self-mergeable (count and DECIMAL
  sum merge exactly across partials), so the state is the rollup
  itself.
- ``n_users`` (COUNT DISTINCT): NOT mergeable from partial counts —
  |A ∪ B| ≠ |A| + |B|. The state carries an AUXILIARY table of
  distinct (group, user_id) keys (the standard IVM companion view);
  per batch it absorbs new keys by union+distinct and the distinct
  count is re-derived per affected group. At true scale the exact
  key table can be swapped for a mergeable HLL sketch
  (operators/approx.hll_partial_sketches) when approximate counts
  are acceptable — same maintenance topology.

Exactness: group counts are integer sums, values merge as
DECIMAL(28,2) (order-independent), and the distinct count is exact by
construction — so the incrementally maintained rollup is
bit-identical to a full recompute, which the registry proves by
hashing `events_incremental_rollup` against the SAME full-recompute
SQL that oracles `events_hourly_rollup`.

Contract: append-only events (no updates/deletes). Deletions need
negated-count tombstones for the sums plus reference counts in the
key table — not implemented; the driver tables are append-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table


@dataclass
class RollupState:
    """The maintained materialization: the rollup's mergeable part
    plus the distinct-user companion view."""

    groups: DataFrame     # window_start, event_type, n_events, total_value_dec
    user_keys: DataFrame  # window_start, event_type, user_id (distinct)


_GROUP_COLS = ("window_start", "event_type")


def _batch_state(events: DataFrame) -> RollupState:
    keyed = events.select(
        F.window("ts", "1 hour").start.alias("window_start"),
        "event_type",
        "user_id",
        F.col("value").cast("decimal(28,2)").alias("v"),
    )
    groups = keyed.groupBy(*_GROUP_COLS).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").alias("total_value_dec"),
    )
    user_keys = keyed.select(*_GROUP_COLS, "user_id").distinct()
    return RollupState(groups, user_keys)


def init_rollup(events: DataFrame) -> RollupState:
    return _batch_state(events)


def merge_rollup(state: RollupState, new_events: DataFrame) -> RollupState:
    """Absorb an event batch. Cost: one pass over the batch plus a
    keyed merge against state rows — the merge joins are on the
    (window, type) group key and the (window, type, user) key, both
    equi, both tiny relative to the fact history."""
    batch = _batch_state(new_events)
    merged_groups = (
        state.groups.select(
            *_GROUP_COLS,
            F.col("n_events").alias("n_base"),
            F.col("total_value_dec").alias("v_base"),
        )
        .join(
            batch.groups.select(
                *_GROUP_COLS,
                F.col("n_events").alias("n_new"),
                F.col("total_value_dec").alias("v_new"),
            ),
            list(_GROUP_COLS),
            "full_outer",
        )
        .select(
            *_GROUP_COLS,
            (F.coalesce("n_base", F.lit(0)) + F.coalesce("n_new", F.lit(0))).alias(
                "n_events"
            ),
            (
                F.coalesce(F.col("v_base"), F.lit(0).cast("decimal(28,2)"))
                + F.coalesce(F.col("v_new"), F.lit(0).cast("decimal(28,2)"))
            )
            .cast("decimal(28,2)")
            .alias("total_value_dec"),
        )
    )
    merged_keys = state.user_keys.unionByName(batch.user_keys).distinct()
    return RollupState(merged_groups, merged_keys)


def rollup_view(state: RollupState) -> DataFrame:
    """Present the maintained state in the batch rollup's schema."""
    n_users = state.user_keys.groupBy(*_GROUP_COLS).agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return state.groups.join(n_users, list(_GROUP_COLS)).select(
        *_GROUP_COLS,
        "n_events",
        F.col("total_value_dec").cast("double").alias("total_value"),
        "n_users",
    )


# ------------------------------------------------------- registry glue

APPEND_MOD = 10  # every 10th event arrives as the append batch


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = init_rollup(ev.filter(F.col("event_id") % APPEND_MOD != 0))
    merged = merge_rollup(base, ev.filter(F.col("event_id") % APPEND_MOD == 0))
    return rollup_view(merged)


QUERIES = {"events_incremental_rollup": q_incremental_rollup}

# The oracle is the FULL-RECOMPUTE rollup — hash equality proves the
# maintained view indistinguishable from recomputing over all events.
ORACLES = {
    "events_incremental_rollup": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
}
