"""Binned range-overlap join: pairs exactly once (even when spanning
many shared bins), equals brute force, and never plans a cartesian."""

from pyspark.sql import functions as F

from searchengine_spark.operators.rangejoin import overlap_join_binned


def _brute(lefts, rights):
    return sorted(
        (li, ri)
        for li, (ls, le) in lefts
        for ri, (rs, re) in rights
        if ls <= re and rs <= le
    )


def test_overlap_pairs_once_vs_brute_force(spark):
    # intervals chosen to span 1..5 bins (bin=10), touch at endpoints,
    # nest, and miss entirely
    lefts = [(1, (0, 5)), (2, (8, 42)), (3, (100, 100)), (4, (15, 16))]
    rights = [(10, (5, 9)), (20, (0, 49)), (30, (99, 120)), (40, (43, 44))]
    l = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in lefts], "lid long, ls long, le long"
    )
    r = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in rights], "rid long, rs long, re long"
    )
    got = overlap_join_binned(
        l, r, l_start="ls", l_end="le", r_start="rs", r_end="re", bin_size=10
    ).select("lid", "rid")
    pairs = sorted((row["lid"], row["rid"]) for row in got.collect())
    assert pairs == _brute(lefts, rights)
    assert len(pairs) == len(set(pairs))  # first-shared-bin dedup held


def test_no_cartesian_in_plan(spark, sf_dir):
    from searchengine_spark.operators.rangejoin import q_session_spike_overlap

    plan = (
        q_session_spike_overlap(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the only nested-loop is the 1-row totals broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_spike_query_matches_oracle(spark, sf_dir):
    from searchengine_spark.operators.rangejoin import ORACLES, q_session_spike_overlap
    from tests.helpers import assert_matches_oracle

    assert_matches_oracle(
        q_session_spike_overlap(spark, sf_dir),
        ORACLES["rel_session_spike_overlap"],
        sf_dir,
        "rel_session_spike_overlap",
    )
