"""Approximate aggregates — the constant-memory scale path for
cardinality and quantile estimation.

The reference computes everything exactly (`countDistinct` at
searchenginespark.py:163, full sorts for ranking); at 100 TB exact
distinct counts and exact percentiles need unbounded per-key state,
so every production engine offers sketch-based variants. This module
exposes them Spark-first:

- `approx_count_distinct` (HyperLogLog++): fixed ~1.5 KB of state per
  group at rsd=0.05 regardless of input size; merges associatively so
  map-side partials work and the shuffle moves sketches, not values.
- `approx_percentile` (KLL-like quantile sketch): mergeable, bounded
  state, vs. the exact sort-based `percentile` used in
  relational/advanced.py.
- `hll_sketch_agg` / `hll_sketch_estimate` (Spark 3.5+ Datasketches):
  the *re-aggregatable* form — persist per-partition sketches once,
  merge any rollup of them later without rescanning raw data. This is
  the materialized-view pattern for cardinality at scale.

Cross-engine note: sketch estimates are implementation-defined, so
these queries register WITHOUT DuckDB oracles (the driver records the
weaker rows-only check); tests/test_approx.py instead asserts
relative-error bounds against the exact answers — the meaningful
correctness property for approximate operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

RSD = 0.05  # target relative standard deviation for HLL++


def approx_user_stats(events: DataFrame) -> DataFrame:
    """Per event-type cardinality + quantile estimates, one pass,
    bounded memory. Exact twins exist in events.q_events_type_stats /
    advanced.q_price_quartiles for error measurement."""
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", RSD).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr("approx_percentile(value, array(0.5, 0.99), 10000)").alias("_pcts"),
        )
        .select(
            "event_type",
            "approx_users",
            "n_events",
            F.round(F.col("_pcts")[0], 6).alias("p50_value"),
            F.round(F.col("_pcts")[1], 6).alias("p99_value"),
        )
    )


def equal_count_bins(df: DataFrame, col: str, n_bins: int) -> DataFrame:
    """Equal-POPULATION binning at scale: approx_percentile cutpoints
    (one sketch pass, bounded memory) + a CASE-expression bin
    assignment (map-only second pass). This is the 100 TB replacement
    for the exact global-NTILE window (relational/advanced.py's
    rel_ntile_customer_value), which moves every row to one task;
    tests/test_approx.py checks the bin populations against the exact
    tiers. Output: input columns + `bin` in [1, n_bins].
    """
    fracs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.agg(
        F.expr(
            f"approx_percentile({col}, array({', '.join(str(f) for f in fracs)}), 10000)"
        ).alias("cuts")
    ).collect()[0]["cuts"]
    bin_expr = F.lit(n_bins)
    # descending CASE: first cut the value is <= wins
    for i in range(n_bins - 2, -1, -1):
        bin_expr = F.when(F.col(col) <= float(cuts[i]), F.lit(i + 1)).otherwise(bin_expr)
    return df.withColumn("bin", bin_expr.cast("bigint"))


def hll_partial_sketches(events: DataFrame, *, n_buckets: int = 16) -> DataFrame:
    """Stage 1 of re-aggregatable cardinality: per-(bucket, event_type)
    Datasketches HLL sketches. At scale these are the rows you persist
    (one small binary per partition-key), not the raw events."""
    return (
        events.withColumn("bucket", F.pmod(F.col("user_id"), F.lit(n_buckets)))
        .groupBy("bucket", "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )


def hll_rollup(partials: DataFrame) -> DataFrame:
    """Stage 2: merge persisted sketches to any coarser grain without
    touching raw data — here bucket-level sketches roll up to global
    per-type cardinality."""
    return (
        partials.groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "event_type",
            F.hll_sketch_estimate("merged").alias("approx_users"),
        )
    )


def q_approx_event_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_user_stats(load_table(spark, sf_dir, "events"))


def q_approx_hll_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return hll_rollup(hll_partial_sketches(ev))


QUERIES = {
    "approx_event_user_stats": q_approx_event_user_stats,
    "approx_hll_rollup_users": q_approx_hll_rollup_users,
}

# Deliberately no ORACLES: sketch outputs are engine-specific; the
# error-bound contract is enforced by tests/test_approx.py.
ORACLES: dict[str, str] = {}
