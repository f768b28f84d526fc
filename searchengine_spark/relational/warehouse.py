"""Warehouse-maintenance operators: delta join-view maintenance and
SCD2 history build.

Two classic materialization shapes the lakehouse family
(sources/versioned.py) and rollup IVM (relational/incremental_agg.py)
don't yet cover:

- **Incremental JOIN view maintenance.** A materialized join view
  V = Orders |x| Customer under appends to BOTH sides maintains with
  the standard delta decomposition

      dV = dO |x| C_old  UNION  O_old |x| dC  UNION  dO |x| dC

  so a batch costs O(|dO| + |dC| + their join fan-out), never a
  re-join of the full fact. At scale the two delta-side joins
  broadcast the delta (a batch is small by definition); only
  dO |x| C_old shuffles, keyed on the same custkey the view is
  already bucketed by. The registry proves the decomposition exact
  by hashing the maintained view against a full-recompute join
  oracle.

- **SCD2 (type-2 slowly changing dimension) history.** Collapse a
  per-customer attribute stream (value tier of each order, ordered
  by order date) into validity intervals [valid_from, valid_to) with
  an is_current flag — the gaps-and-islands build every dimension
  load runs. Shape: two row_number windows partitioned by customer
  (bounded rows per partition), one keyed agg, one lead() — no
  self-joins, no fact-table windows.

Reference scope: abh2050/searchengine is a read-only search corpus;
maintenance ops come from the builder brief's lakehouse/pipeline
requirements (see sources/versioned.py docstring for the table
format this would feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from searchengine_spark.io import load_table

# every 10th order / 20th customer arrives as the append batch
ORDER_MOD = 10
CUST_MOD = 20

TIER_BAND = 100_000.0  # o_totalprice band width for the SCD2 attribute


def join_view(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The maintained join view's projection."""
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey",
        "o_custkey",
        "c_mktsegment",
        F.col("o_totalprice").cast("decimal(28,2)").alias("o_totalprice_dec"),
    )


def merge_join_view(
    old_view: DataFrame,
    old_orders: DataFrame,
    new_orders: DataFrame,
    old_customer: DataFrame,
    new_customer: DataFrame,
) -> DataFrame:
    """Delta decomposition; the delta-sided joins broadcast the batch."""
    d1 = join_view(new_orders, old_customer)
    d2 = old_orders.join(
        F.broadcast(new_customer),
        old_orders.o_custkey == new_customer.c_custkey,
    ).select(
        "o_orderkey",
        "o_custkey",
        "c_mktsegment",
        F.col("o_totalprice").cast("decimal(28,2)").alias("o_totalprice_dec"),
    )
    d3 = join_view(new_orders, new_customer)
    return old_view.unionByName(d1).unionByName(d2).unionByName(d3)


def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained view after one append batch on each side; hash-equal
    to the full-recompute join (the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o_old = orders.filter(F.col("o_orderkey") % ORDER_MOD != 0)
    o_new = orders.filter(F.col("o_orderkey") % ORDER_MOD == 0)
    c_old = customer.filter(F.col("c_custkey") % CUST_MOD != 0)
    c_new = customer.filter(F.col("c_custkey") % CUST_MOD == 0)
    base = join_view(o_old, c_old)
    merged = merge_join_view(base, o_old, o_new, c_old, c_new)
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "c_mktsegment",
        F.col("o_totalprice_dec").cast("double").alias("o_totalprice"),
    )


def q_scd2_customer_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals of each customer's order-value tier."""
    orders = load_table(spark, sf_dir, "orders")
    tier = F.floor(F.col("o_totalprice") / F.lit(TIER_BAND)).cast("bigint")
    seq = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        tier.alias("tier"),
    )
    w_all = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_tier = Window.partitionBy("o_custkey", "tier").orderBy(
        "o_orderdate", "o_orderkey"
    )
    islands = seq.select(
        "o_custkey",
        "o_orderdate",
        "tier",
        F.row_number().over(w_all).alias("rn"),
        (F.row_number().over(w_all) - F.row_number().over(w_tier)).alias("seg"),
    )
    spans = islands.groupBy("o_custkey", "tier", "seg").agg(
        F.min("o_orderdate").alias("valid_from"),
        # the span's first row position: a UNIQUE chronological order
        # (valid_from alone ties when tiers alternate within one day)
        F.min("rn").alias("ord"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w_next = Window.partitionBy("o_custkey").orderBy("ord")
    return spans.select(
        "o_custkey",
        "tier",
        "valid_from",
        F.lead("valid_from").over(w_next).alias("valid_to"),
        F.lead("valid_from").over(w_next).isNull().cast("int").alias("is_current"),
        "n_orders",
    )


_IVM_JOIN_SQL = """
SELECT o_orderkey, o_custkey, c_mktsegment,
       CAST(CAST(o_totalprice AS DECIMAL(28,2)) AS DOUBLE) AS o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""

_SCD2_SQL = f"""
WITH seq AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST(floor(o_totalprice / {TIER_BAND}) AS BIGINT) AS tier
  FROM orders
),
islands AS (
  SELECT o_custkey, o_orderdate, tier,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey)
         - row_number() OVER (PARTITION BY o_custkey, tier
                              ORDER BY o_orderdate, o_orderkey) AS seg
  FROM seq
),
spans AS (
  SELECT o_custkey, tier, seg,
         MIN(o_orderdate) AS valid_from,
         MIN(rn) AS ord,
         count(*)::BIGINT AS n_orders
  FROM islands GROUP BY 1, 2, 3
)
SELECT o_custkey, tier, valid_from,
       lead(valid_from) OVER w AS valid_to,
       CASE WHEN lead(valid_from) OVER w IS NULL THEN 1 ELSE 0 END AS is_current,
       n_orders
FROM spans
WINDOW w AS (PARTITION BY o_custkey ORDER BY ord)
"""

QUERIES = {
    "rel_ivm_join_delta": q_ivm_join_delta,
    "rel_scd2_customer_tier": q_scd2_customer_tier,
}
ORACLES = {
    "rel_ivm_join_delta": _IVM_JOIN_SQL,
    "rel_scd2_customer_tier": _SCD2_SQL,
}
