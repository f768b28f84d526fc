"""Error-bound contracts for approximate aggregates.

Sketch estimates are engine-specific (no DuckDB oracle possible), so
the correctness property tested is relative error vs the exact
answer — the guarantee a user of the 100 TB scale path relies on.
"""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators import approx as A
from searchengine_spark.operators.approx import (
    approx_user_stats,
    hll_partial_sketches,
    hll_rollup,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="module")
def exact_by_type(events):
    rows = (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    )
    return {r["event_type"]: r for r in rows}


def test_approx_count_distinct_error_bound(events, exact_by_type):
    approx = {r["event_type"]: r for r in approx_user_stats(events).collect()}
    assert set(approx) == set(exact_by_type)
    for et, ex in exact_by_type.items():
        rel_err = abs(approx[et]["approx_users"] - ex["users"]) / ex["users"]
        # rsd=0.05 -> 3 sigma = 15%; generous but catches gross breakage
        assert rel_err < 0.15, (et, approx[et]["approx_users"], ex["users"])


def test_approx_percentile_rank_error_bound(events, exact_by_type):
    """The sketch's guarantee is on RANK, not value: the returned
    estimate must sit within epsilon of the requested quantile's rank
    (value-scale error is unbounded on heavy tails)."""
    approx = {r["event_type"]: r for r in approx_user_stats(events).collect()}
    for et in exact_by_type:
        sub = events.filter(F.col("event_type") == et)
        n = sub.count()
        for target, col in ((0.5, "p50_value"), (0.99, "p99_value")):
            v = approx[et][col]
            rank = sub.filter(F.col("value") <= v).count() / n
            assert abs(rank - target) <= 0.01 + 1.0 / n, (et, col, v, rank)


def test_hll_rollup_matches_direct_estimate(events, exact_by_type):
    """Merging per-bucket sketches must estimate within bounds AND the
    rollup must not depend on the bucketing (re-aggregatability)."""
    merged = {r["event_type"]: r["approx_users"] for r in hll_rollup(
        hll_partial_sketches(events, n_buckets=16)
    ).collect()}
    merged_4 = {r["event_type"]: r["approx_users"] for r in hll_rollup(
        hll_partial_sketches(events, n_buckets=4)
    ).collect()}
    assert merged == merged_4  # sketch union is associative
    for et, ex in exact_by_type.items():
        rel_err = abs(merged[et] - ex["users"]) / ex["users"]
        assert rel_err < 0.15, (et, merged[et], ex["users"])


def test_equal_count_bins_matches_exact_ntile(spark, sf_dir):
    """The sketch-based equal-population binning (the 100 TB path)
    must put nearly the same number of rows in each bin as the exact
    global NTILE (the single-task ground truth)."""
    from searchengine_spark.operators.approx import equal_count_bins

    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    binned = equal_count_bins(cust, "c_acctbal", 4)
    counts = {
        r.bin: r.n
        for r in binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {1, 2, 3, 4}
    assert sum(counts.values()) == n
    for b, c in counts.items():
        # sketch rank error is tiny at accuracy=10000; allow 5% + ties
        assert abs(c - n / 4) <= 0.05 * n + 2, (b, c, n)
    # bins are ordered by value: max of bin i <= min of bin i+2 region
    stats = {
        r.bin: (r.lo, r.hi)
        for r in binned.groupBy("bin")
        .agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
        .collect()
    }
    for b in (1, 2, 3):
        assert stats[b][1] <= stats[b + 1][0] + 1e-9


def test_equal_count_bins_audit_matches_oracle(spark, sf_dir):
    """Driver-checked NTILE-replacement audit: all bins present, each
    within tolerance of equal population, total exact."""
    from tests.helpers import assert_matches_oracle

    df = A.q_approx_equal_count_bins(spark, sf_dir)
    rows = df.collect()
    assert [r["bin"] for r in rows] == list(range(1, A.N_BINS + 1))
    assert all(r["pop_ok"] for r in rows)
    assert_matches_oracle(
        df,
        A.ORACLES["approx_equal_count_bins"],
        sf_dir,
        name="approx_equal_count_bins",
    )
