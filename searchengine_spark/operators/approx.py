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


# Invariant bounds the driver hash-checks (round-7: the former
# rows-only registrations now emit bounded-error audit frames, so
# every registry query is hash-checkable). Bounds are 2-3x the worst
# error MEASURED across sf0.001/0.01/0.1 — tight enough to catch a
# broken sketch, loose enough never to flake:
#   approx_count_distinct(rsd=0.05): max observed rel-err 0.067 (sf0.1)
#   Datasketches HLL union rollup:   max observed rel-err 0.008
#   approx_percentile(acc=10000):    rank error ~1e-4
ACD_REL_ERR_BOUND = 0.15  # 3x the requested rsd
HLL_REL_ERR_BOUND = 0.05
P50_RANK_BOUNDS = (0.45, 0.55)
P99_RANK_BOUNDS = (0.97, 1.0)


def q_approx_event_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error AUDIT of the HLL++/quantile-sketch estimates: the
    exact per-type counts (hash-checkable by DuckDB) plus booleans
    asserting each estimate sits within its error bound. A sketch
    implementation drifting out of bound flips a boolean and fails
    the driver's hash — the strongest cross-engine statement possible
    for engine-specific sketch outputs (the raw estimates stay
    available via approx_user_stats)."""
    ev = load_table(spark, sf_dir, "events")
    ap = approx_user_stats(ev)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # rank-error check: fraction of values <= the sketch's percentile
    # must bracket the target rank (the actual KLL guarantee)
    ranks = (
        ev.join(
            F.broadcast(ap.select("event_type", "p50_value", "p99_value")),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.avg((F.col("value") <= F.col("p50_value")).cast("double")).alias("f50"),
            F.avg((F.col("value") <= F.col("p99_value")).cast("double")).alias("f99"),
        )
    )
    return (
        exact.join(ap.select("event_type", "approx_users"), "event_type")
        .join(ranks, "event_type")
        .select(
            "event_type",
            "n_events",
            "n_users",
            (
                F.abs(F.col("approx_users") - F.col("n_users"))
                / F.col("n_users")
                <= F.lit(ACD_REL_ERR_BOUND)
            ).alias("users_err_ok"),
            F.col("f50").between(*P50_RANK_BOUNDS).alias("p50_rank_ok"),
            F.col("f99").between(*P99_RANK_BOUNDS).alias("p99_rank_ok"),
        )
    )


def q_approx_hll_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error AUDIT of the re-aggregatable Datasketches rollup:
    merging bucket-level sketches must estimate per-type cardinality
    within HLL_REL_ERR_BOUND of exact (raw estimates via
    hll_rollup)."""
    ev = load_table(spark, sf_dir, "events")
    merged = hll_rollup(hll_partial_sketches(ev))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("approx_users") - F.col("n_users")) / F.col("n_users")
            <= F.lit(HLL_REL_ERR_BOUND)
        ).alias("rel_err_ok"),
    )


N_BINS = 4
BIN_POP_TOL = 0.05  # each bin within ±5% of n/N_BINS (measured ~1e-3)


def q_approx_equal_count_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error AUDIT of sketch-based equal-population binning —
    the 100 TB replacement for a global NTILE window. Every bin must
    exist and hold n/N_BINS rows within BIN_POP_TOL; the exact total
    is hash-checked, the per-bin populations are engine-specific (the
    cutpoints come from the sketch) so they enter as booleans."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    binned = equal_count_bins(orders, "o_totalprice", N_BINS)
    total = binned.count()
    target = total / N_BINS
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "bin",
            F.lit(total).cast("bigint").alias("n_total"),
            (
                F.abs(F.col("_n") - F.lit(target)) / F.lit(target)
                <= F.lit(BIN_POP_TOL)
            ).alias("pop_ok"),
        )
        .orderBy("bin")
    )


QUERIES = {
    "approx_event_user_stats": q_approx_event_user_stats,
    "approx_hll_rollup_users": q_approx_hll_rollup_users,
    "approx_equal_count_bins": q_approx_equal_count_bins,
}

# The exact halves of the audit frames are fully SQL-expressible; the
# booleans are the invariants — DuckDB states them as TRUE and the
# driver's hash check enforces them.
ORACLES: dict[str, str] = {
    "approx_event_user_stats": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               TRUE AS users_err_ok,
               TRUE AS p50_rank_ok,
               TRUE AS p99_rank_ok
        FROM events GROUP BY event_type
    """,
    "approx_hll_rollup_users": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               TRUE AS rel_err_ok
        FROM events GROUP BY event_type
    """,
    "approx_equal_count_bins": f"""
        SELECT CAST(r.bin AS BIGINT) AS bin,
               (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_total,
               TRUE AS pop_ok
        FROM range(1, {N_BINS + 1}) AS r(bin)
        ORDER BY bin
    """,
}
