"""Forward/tolerance as-of join (relational/advanced.py)."""

from pyspark.sql import functions as F

from searchengine_spark.relational import advanced as A
from tests.helpers import assert_matches_oracle


def test_forward_asof_matches_naive_definition(spark):
    """matched_ts == min(right.ts >= left.ts, within tolerance) per
    key — brute-forced on a deterministic pseudo-random dataset."""
    rng_state = 54321

    def rng():
        nonlocal rng_state
        rng_state = (rng_state * 1103515245 + 12345) % (1 << 31)
        return rng_state

    lefts = [(rng() % 5, 1000 + rng() % 500, i) for i in range(80)]
    rights = [(rng() % 5, 1000 + rng() % 500) for _ in range(60)]
    tol = 60

    left_df = spark.createDataFrame(
        lefts, "user_id bigint, ts bigint, event_id bigint"
    ).selectExpr("user_id", "timestamp_seconds(ts) as ts", "event_id")
    right_df = spark.createDataFrame(
        rights, "user_id bigint, ts bigint"
    ).selectExpr("user_id", "timestamp_seconds(ts) as ts")

    got = {
        r.event_id: (
            None if r.matched_ts is None else int(r.matched_ts.timestamp())
        )
        for r in A.asof_join_next_event(
            left_df, right_df, key="user_id", tolerance_s=tol
        ).collect()
    }
    for k, t, e in lefts:
        cand = [rt for rk, rt in rights if rk == k and t <= rt <= t + tol]
        expect = min(cand) if cand else None
        assert got[e] == expect, (e, k, t)


def test_forward_asof_query_matches_oracle(spark, sf_dir):
    df = A.q_asof_forward_next_purchase(spark, sf_dir)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("purchase_ts").alias("matched"),
        F.min("secs_to_convert").alias("lo"),
        F.max("secs_to_convert").alias("hi"),
    ).collect()[0]
    # a real mix of converted and unconverted signups, horizon honored
    assert 0 < agg["matched"] < agg["n"]
    assert agg["lo"] >= 0 and agg["hi"] <= A.ASOF_FWD_TOL_S
    assert_matches_oracle(
        df,
        A.ORACLES["rel_asof_forward_next_purchase"],
        sf_dir,
        name="rel_asof_forward_next_purchase",
    )
