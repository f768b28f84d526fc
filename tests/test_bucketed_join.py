"""Co-located fact-fact join via bucketing: when both sides are
bucketed on the join key with the same bucket count, the sort-merge
join needs NO Exchange on either side — the shuffle happened once at
write time and is amortized over every subsequent join.

This is THE layout decision for repeated fact-fact joins at 100 TB
(orders ⋈ lineitem on orderkey): without it every query re-shuffles
both tables; with it each task reads matching buckets directly.
"""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    for name, df, key in (
        ("bt_orders", orders, "o_orderkey"),
        ("bt_lineitem", li, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    yield spark.table("bt_orders"), spark.table("bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_bucketed_join_has_no_exchange(bucketed_tables, spark):
    orders, li = bucketed_tables
    # At test scale AQE would broadcast the tiny side, which hides
    # what's being demonstrated; at 100 TB neither fact broadcasts
    # and the bucketed layout is what removes both exchanges.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not reshuffle either side; the only
        # exchange allowed is the small post-join aggregation
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(bucketed_tables, spark, sf_dir):
    orders_b, li_b = bucketed_tables
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def agg(o, l):
        return {
            r["o_orderpriority"]: r["n"]
            for r in l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    assert agg(orders_b, li_b) == agg(orders, li)
