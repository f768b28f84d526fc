"""Plan-quality regression guards: the physical plans must keep the
shapes that make these queries scale (pushdown, broadcast, top-k
short-circuit, no exchange on bucketed aggregation)."""

import pytest

from searchengine_spark.registry import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_predicate_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q3_broadcasts_and_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter pushed


def test_bm25_topk_shape(spark, sf_dir):
    plan = _plan(spark, sf_dir, "se_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_cosine_filter_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sim_cosine_topk")
    assert "PushedFilters: [IsNotNull(vec_id)" in plan
    assert "TakeOrderedAndProject" in plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """Cross joins are allowed only against literal 1-row broadcasts
    (scoring params / query vectors) — never between real tables."""
    for name in (
        "dedup_neardup_pairs",
        "dedup_simhash_pairs",
        "rel_asof_purchase_signup",
        "pipeline_curated_docs",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
