"""Relational operator coverage over the TPC-H-style test tables.

These queries exercise the full relational surface a 100 TB engine
needs — multi-way joins (broadcast for dims, shuffle for facts),
hash aggregation with map-side partials, semi/anti joins, window
functions, top-k — each with a DuckDB oracle twin.

Float determinism: monetary sums are computed over DECIMAL(18,2/4/6)
casts (exact, order-independent) and cast back to DOUBLE, so Spark's
parallel aggregation and DuckDB's serial one produce bit-identical
results. Input values are 2-decimal doubles; products get wider
scales before the cast.

Scale notes per query are in the docstrings; the common pattern:
filter first (pushdown), join facts to broadcast dims, aggregate on
the fact's natural key, TakeOrderedAndProject for top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-03-15"


def _dec_sum(col, scale: int = 2):
    """Order-independent sum of a money-valued double column."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy single-pass aggregation.

    At scale: one parquet scan with the shipdate predicate pushed to
    row groups, hash-agg with 6 partials combined map-side; the final
    shuffle moves only |returnflag x linestatus| ~ 6 rows per task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    charge = disc_price * (1.0 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(disc_price, 4).alias("sum_disc_price"),
            _dec_sum(charge, 6).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
        .withColumn(
            "avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 6)
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: fact-to-fact join + top-k.

    customer (filtered, small) broadcasts into orders; orders⋈lineitem
    shuffles on orderkey; top-10 is TakeOrderedAndProject (no global
    sort materialization).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dec_sum(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; all dims broadcast, one fact shuffle."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))

    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == dims.c_custkey)
        .join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            (li.l_suppkey == F.col("s_suppkey"))
            & (dims.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(_dec_sum(revenue, 4).alias("revenue"))
    )


def q_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a LEFT SEMI join (no row duplication)."""
    orders = load_table(spark, sf_dir, "orders")
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
    )
    return (
        orders.join(
            late.select("l_orderkey"),
            orders.o_orderkey == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_customers_no_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers that never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti"
        )
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: rank customers by revenue within nation.

    At scale: one shuffle on custkey for the agg, one on nationkey for
    the window; both keys are low-skew.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,2)")).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        cust.join(spend, cust.c_custkey == spend.o_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "revenue")
        .withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + global sum — the minimal
    pushdown benchmark (every predicate reaches the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations over two order dims."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).cast("double").alias("total"),
    )


def q_pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per market segment x order status.

    Explicit pivot values keep the output schema static (required for
    both cross-engine comparison and any production job — inferred
    pivot values mean a full extra pass + nondeterministic columns).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery
    (l_quantity < 0.2 * avg(l_quantity) per part), decorrelated into
    a join against the per-part aggregate — the standard Catalyst
    rewrite, expressed explicitly so the shuffle is keyed once on
    partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume per ship year.

    supplier and customer nations both resolve through broadcast dims;
    the only big shuffle is the final (supp_nation, cust_nation, year)
    aggregation.
    """
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))

    n1 = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(sup.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cnk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dec_sum(revenue, 4).alias("revenue"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_name", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dec_sum(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping + distinct-count + min/max over the part dim."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_brand").alias("n_brands"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        F.sum(F.col("p_retailprice").cast("decimal(28,2)")).cast("double").alias("sum_price"),
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution per customer.

    Two-level aggregation over a LEFT OUTER join: the outer join keeps
    zero-order customers (c_count = 0 via COUNT of a nullable column).
    At scale: first agg shuffles on custkey (high cardinality, even);
    second agg's key space is tiny (~distinct order counts), so the
    second shuffle moves one row per (task, c_count).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue %).

    CASE-gated sums in one pass over the filtered fact; part joins
    broadcast here (small dim at test SFs — at true TPC-H 100 TB part
    is fact-sized and AQE would pick a shuffle hash join on partkey).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .agg(
            _dec_sum(promo_rev, 4).alias("promo_revenue"),
            _dec_sum(revenue, 4).alias("total_revenue"),
        )
        .withColumn(
            "promo_pct",
            F.round(100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6),
        )
    )


Q18_QTY_THRESHOLD = 250


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregate, joined back to facts.

    The quantity aggregate keeps ~1% of orders (threshold at the q99),
    so the join back to orders is small-side broadcastable after AQE
    sees the runtime size; top-100 is TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_name")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of composite brand/size/quantity
    predicates across the join (OR of ANDs).

    The p_size/p_brand conjuncts prune part before the join; the
    l_quantity bounds are fact-side scan predicates (pushed to
    parquet); only the cross-table OR is evaluated post-join.
    Brand/size windows adapted to the synthetic dataset's value
    ranges (reference TPC-H constants give empty results here).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    cond = (
        (
            F.col("p_brand").isin("Brand#12", "Brand#13", "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            F.col("p_brand").isin("Brand#23", "Brand#24")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            F.col("p_brand").isin("Brand#34", "Brand#35")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        li.filter(F.col("l_quantity").between(1, 35))
        .join(
            F.broadcast(
                part.select("p_partkey", "p_brand", "p_size").filter(
                    F.col("p_size").between(1, 35)
                )
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(
            _dec_sum(revenue, 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q22_CUTOFF = "1998-06-01"


def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average
    balance) + time-windowed anti join (no recent orders), grouped by
    market segment (stand-in for the reference's phone country code).

    The 1-row average broadcasts via crossJoin; the anti join's right
    side is pre-filtered by date so only recent orderkeys shuffle.
    Average is computed as exact decimal sum / count, so both engines
    agree bit-for-bit despite different summation orders.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(28,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


Q15_START, Q15_END = "1997-01-01", "1997-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax against an aggregate — suppliers whose
    quarterly revenue equals MAX(revenue) over all suppliers.

    The revenue aggregate is computed once and reused for both the
    per-supplier rows and the 1-row max (broadcast crossJoin); the
    equality compare is safe cross-engine because revenue is a
    decimal-exact sum. At scale: one fact shuffle on suppkey, the max
    is a tiny second-stage agg."""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
    )
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(_dec_sum(revenue, 4).alias("total_revenue"))
    maxr = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        sup.join(rev, sup.s_suppkey == F.col("l_suppkey"))
        .crossJoin(F.broadcast(maxr))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q8_NATION = "NATION_3"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year market share of one supplier nation —
    a conditional-aggregate RATIO per group (vs Q14's global ratio).

    All dims broadcast; the single fact shuffle is the per-year
    aggregation. The share divides two decimal-exact sums, rounded on
    both engines."""
    nation = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))

    sup_nat = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    nat_rev = F.when(F.col("supp_nation") == Q8_NATION, revenue).otherwise(F.lit(0.0))
    return (
        li.join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(sup_nat), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _dec_sum(nat_rev, 4).alias("nation_revenue"),
            _dec_sum(revenue, 4).alias("total_revenue"),
        )
        .withColumn(
            "mkt_share",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6),
        )
    )


QUERIES = {
    "tpch_q1_pricing_summary": q1_pricing_summary,
    "tpch_q3_shipping_priority": q3_shipping_priority,
    "tpch_q5_local_supplier_volume": q5_local_supplier_volume,
    "tpch_q4_order_priority_semi": q_order_priority_semi,
    "rel_customers_no_orders_anti": q_customers_no_orders_anti,
    "rel_top_customers_per_nation": q_top_customers_per_nation,
    "rel_part_type_stats": q_part_type_stats,
    "tpch_q6_forecast_revenue": q6_forecast_revenue,
    "rel_cube_status_priority": q_cube_status_priority,
    "rel_pivot_segment_status": q_pivot_segment_status,
    "tpch_q17_small_quantity_revenue": q17_small_quantity_revenue,
    "tpch_q7_volume_shipping": q7_volume_shipping,
    "tpch_q10_returned_items": q10_returned_items,
    "tpch_q13_customer_distribution": q13_customer_distribution,
    "tpch_q14_promo_revenue": q14_promo_revenue,
    "tpch_q18_large_volume_customers": q18_large_volume_customers,
    "tpch_q19_discounted_revenue": q19_discounted_revenue,
    "tpch_q22_wealthy_inactive": q22_wealthy_inactive,
    "tpch_q8_market_share": q8_market_share,
    "tpch_q15_top_supplier": q15_top_supplier,
}

ORACLES = {
    "tpch_q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
               COUNT(*) AS count_order,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = '{Q3_SEGMENT}'
          AND o_orderdate < TIMESTAMP '{Q3_DATE}'
          AND l_shipdate > TIMESTAMP '{Q3_DATE}'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5_local_supplier_volume": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        GROUP BY n_name
    """,
    "tpch_q4_order_priority_semi": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2000-01-01'
        )
        GROUP BY o_orderpriority
    """,
    "rel_customers_no_orders_anti": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "rel_top_customers_per_nation": """
        WITH spend AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
          FROM orders GROUP BY o_custkey
        )
        SELECT n_name, c_custkey, revenue, rnk FROM (
          SELECT n_name, c_custkey, revenue,
                 RANK() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey ASC) AS rnk
          FROM customer
          JOIN spend ON c_custkey = o_custkey
          JOIN nation ON c_nationkey = n_nationkey
        ) WHERE rnk <= 3
    """,
    "tpch_q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
    """,
    "tpch_q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "tpch_q17_small_quantity_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price,
               COUNT(*) AS n_items
        FROM lineitem l
        WHERE l_quantity < 0.2 * (
          SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
          FROM lineitem WHERE l_partkey = l.l_partkey
        )
    """,
    "rel_pivot_segment_status": """
        SELECT c_mktsegment,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "tpch_q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "rel_cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "tpch_q15_top_supplier": f"""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
            AND l_shipdate < TIMESTAMP '{Q15_END}'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "tpch_q8_market_share": f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(CASE WHEN n_name = '{Q8_NATION}'
                                  THEN l_extendedprice * (1.0 - l_discount)
                                  ELSE 0.0 END AS DECIMAL(28,4))) AS DOUBLE) AS nation_revenue,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue,
               ROUND(CAST(SUM(CAST(CASE WHEN n_name = '{Q8_NATION}'
                                  THEN l_extendedprice * (1.0 - l_discount)
                                  ELSE 0.0 END AS DECIMAL(28,4))) AS DOUBLE)
                     / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE), 6) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1
    """,
    "tpch_q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_custkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "tpch_q14_promo_revenue": """
        SELECT
          CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1.0 - l_discount)
                             ELSE 0.0 END AS DECIMAL(28,4))) AS DOUBLE) AS promo_revenue,
          CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue,
          ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1.0 - l_discount)
                             ELSE 0.0 END AS DECIMAL(28,4))) AS DOUBLE)
                      / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE), 6) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-03-01'
    """,
    "tpch_q18_large_volume_customers": f"""
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) > {Q18_QTY_THRESHOLD}
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "tpch_q19_discounted_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand IN ('Brand#12','Brand#13','Brand#14')
               AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand IN ('Brand#23','Brand#24')
               AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand IN ('Brand#34','Brand#35')
               AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 35)
    """,
    "tpch_q22_wealthy_inactive": f"""
        WITH ab AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c_mktsegment, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_bal
        FROM customer, ab
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF}'
          )
        GROUP BY c_mktsegment
    """,
    "rel_part_type_stats": """
        SELECT p_type, COUNT(*) AS n_parts,
               COUNT(DISTINCT p_brand) AS n_brands,
               MIN(p_retailprice) AS min_price,
               MAX(p_retailprice) AS max_price,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        FROM part
        GROUP BY p_type
    """,
}
