"""Delta join-view maintenance + SCD2 interval invariants."""

from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.relational.warehouse import (
    q_ivm_join_delta,
    q_scd2_customer_tier,
)


def test_ivm_join_equals_full_recompute(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    full = orders.join(customer, orders.o_custkey == customer.c_custkey)
    maintained = q_ivm_join_delta(spark, sf_dir)
    assert maintained.count() == full.count()
    # no duplicated or dropped join rows: orderkey is unique in the view
    assert maintained.select("o_orderkey").distinct().count() == maintained.count()


def test_scd2_intervals_chain_and_current_is_unique(spark, sf_dir):
    rows = q_scd2_customer_tier(spark, sf_dir).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    for cust, spans in by_cust.items():
        current = [r for r in spans if r["is_current"]]
        assert len(current) == 1, cust
        assert current[0]["valid_to"] is None
        # intervals chain: each non-current valid_to is a later-or-equal
        # span's valid_from; consecutive spans never share a tier
        # (otherwise the islands step failed to merge them)
        spans_sorted = sorted(
            spans, key=lambda r: (r["valid_to"] is None, r["valid_from"])
        )
        froms = {r["valid_from"] for r in spans}
        for r in spans_sorted:
            if r["valid_to"] is not None:
                assert r["valid_to"] in froms, cust
                assert r["valid_to"] >= r["valid_from"], cust


def test_scd2_merges_consecutive_equal_tiers(spark, sf_dir):
    # pushing every order into ONE tier must collapse each customer's
    # history to a single current span
    import searchengine_spark.relational.warehouse as wh

    old = wh.TIER_BAND
    wh.TIER_BAND = 1e12
    try:
        rows = q_scd2_customer_tier(spark, sf_dir).collect()
    finally:
        wh.TIER_BAND = old
    assert rows and all(r["is_current"] == 1 for r in rows)
