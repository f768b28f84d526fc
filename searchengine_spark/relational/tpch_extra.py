"""TPC-H completion set: the seven query shapes (Q2, Q9, Q11, Q12,
Q16, Q20, Q21) absent from relational/tpch.py, adapted to the
synthetic schema.

The driver's tables carry no ``partsupp`` and lineitem has no
commit/receipt dates or shipmode, so the TPC-H spec text is not
expressible verbatim; each query here keeps the *operator shape* that
makes its spec interesting — argmin-per-group (Q2), multi-dim profit
rollup (Q9), fraction-of-global HAVING (Q11), conditional priority
counts over a date-arithmetic join (Q12), distinct-count with NOT-IN
and anti-join exclusions (Q16), nested semi-join chain (Q20), dual
correlated EXISTS/NOT EXISTS decorrelated into one keyed aggregation
(Q21) — substituting surviving columns for the missing ones.

Reference parity: the reference engine's relational surface is the
DataFrame select/filter/join/agg subset catalogued in SURVEY.md §2
(e.g. /root/reference/searchenginespark.py joins + groupBy); these
queries extend it with the canonical decision-support shapes a
migrating user would expect, each with an exact DuckDB oracle twin.

Float determinism: every money sum goes through DECIMAL(28,s) as in
relational/tpch.py, so Spark's parallel aggregation and DuckDB's
serial one agree bit-for-bit; ratio/share comparisons divide or scale
those exact sums with identical IEEE arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.io import load_table


def _dec_sum(col, scale: int = 2):
    """Order-independent sum of a money-valued double column."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


Q2_REGION = "EUROPE"
Q2_TYPE = "STANDARD"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: argmin-per-group — for each part, the
    supplier(s) achieving the minimum observed unit cost within one
    region (unit cost from lineitem, standing in for the missing
    ps_supplycost).

    At scale: the (partkey, suppkey) aggregation is the only fact
    shuffle; the per-part min is a window over the already-reduced
    frame (same partkey partitioning, no second exchange); supplier/
    nation/region resolve as broadcast dims. No correlated subquery
    survives into the physical plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q2_TYPE)
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)

    regional_sup = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(F.broadcast(regional_sup.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part.select("p_partkey", "p_name")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(regional_sup), F.col("l_suppkey") == regional_sup.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
    )


Q9_NAME_FRAGMENT = "rod"
Q9_COST_FACTOR = 0.6


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit rollup by (supplier nation, order year)
    over a name-filtered part family. Cost is proxied as
    0.6 * p_retailprice * l_quantity (no partsupp in this schema).

    At scale: part (pre-filtered by the LIKE) and supplier/nation
    broadcast; the orders join shuffles on orderkey; the final
    aggregate's key space is |nations| x |years| — tiny. Both profit
    terms go through separate DECIMAL casts so the sum of differences
    is exact on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_FRAGMENT)
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    revenue = (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
        "decimal(28,4)"
    )
    cost = (F.lit(Q9_COST_FACTOR) * F.col("p_retailprice") * F.col("l_quantity")).cast(
        "decimal(28,4)"
    )
    sup_nat = sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sup_nat), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(revenue - cost).cast("double").alias("sum_profit"))
    )


Q11_REGION = "ASIA"
Q11_FRACTION = 0.001


def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a fraction of a global
    aggregate — parts whose shipped value through one region's
    suppliers exceeds 0.1% of that region's total shipped value.

    At scale: one fact shuffle on partkey produces the per-part
    values; the global total is a second-stage agg over the
    already-reduced frame (thousands of rows, not billions),
    broadcast back via crossJoin. The regional supplier filter is a
    broadcast semi-join ahead of the shuffle, so non-regional rows
    never pay shuffle I/O.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q11_REGION)

    regional_keys = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = (
        li.join(F.broadcast(regional_keys), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(_dec_sum(value, 4).alias("part_value"))
    )
    total = per_part.agg(
        F.sum(F.col("part_value").cast("decimal(28,4)")).cast("double").alias("_tot")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > Q11_FRACTION * F.col("_tot"))
        .select("l_partkey", "part_value")
    )


Q12_LATE_DAYS = 90
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts over a
    date-arithmetic "late shipment" join (l_returnflag stands in for
    the missing l_shipmode; shipdate > orderdate + 90 days stands in
    for the missing receipt/commit comparison).

    At scale: one orderkey-keyed shuffle join; the CASE-gated counts
    aggregate map-side into |returnflag| ~ 3 groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS"))
    is_high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return late.groupBy("l_returnflag").agg(
        F.count(F.when(is_high, 1)).alias("high_line_count"),
        F.count(F.when(~is_high, 1)).alias("low_line_count"),
    )


Q16_EXCLUDE_BRAND = "Brand#1"
Q16_SIZES = (1, 4, 9, 14, 23, 36, 45, 49)
Q16_COMPLAINT_BAL = 1000.0


def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute
    triple, with a NOT-IN brand/type exclusion and an anti-join
    supplier blocklist (low-balance suppliers stand in for the
    "customer complaints" LIKE subquery).

    At scale: the distinct is a two-key aggregation — first
    (brand, type, size, suppkey) dedup with map-side partials, then
    the count per triple; part broadcasts into the fact, the supplier
    blocklist is a broadcast anti-join BEFORE the shuffle so excluded
    rows never move.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCLUDE_BRAND)
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*Q16_SIZES)
    )
    complaints = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < Q16_COMPLAINT_BAL
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(
            F.broadcast(complaints.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q20_YEAR_START, Q20_YEAR_END = "1997-01-01", "1998-01-01"
Q20_SHARE = 0.5
Q20_REGION = "AMERICA"


def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers in one
    region who shipped more than half of some part's total 1997
    volume (share-of-part stands in for the missing partsupp
    availqty comparison).

    At scale: one (partkey, suppkey) shuffle for the inner agg; the
    per-part total reuses that reduced frame via a partkey window (no
    second fact scan); the qualifying suppkey set is tiny and drives
    a broadcast LEFT SEMI into supplier. The chain subquery→semi→dim
    never duplicates supplier rows.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q20_REGION)

    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        _dec_sum(F.col("l_quantity")).alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn(
            "part_qty", F.sum(F.col("supp_qty").cast("decimal(28,2)")).over(w).cast("double")
        )
        .filter(F.col("supp_qty") > Q20_SHARE * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(F.broadcast(dominant), sup.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_name", "n_name")
    )


def q21_waiting_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: dual correlated EXISTS / NOT EXISTS — for
    finalized multi-supplier orders, the one supplier whose item came
    back ('R' returns stand in for the missing receipt>commit lateness
    test) while no co-supplier's did.

    The spec's two correlated lineitem self-joins are decorrelated
    into ONE orderkey aggregation (distinct suppliers, distinct
    returning suppliers) joined back to the returning rows — at
    100 TB that turns three fact-fact joins into one keyed agg plus
    one keyed join, and the ORACLE keeps the literal EXISTS/NOT
    EXISTS form to prove the rewrite exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = load_table(spark, sf_dir, "supplier")

    per_order = li.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
            "n_ret_supp"
        ),
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        returned.join(per_order, returned.l_orderkey == F.col("agg_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
        .join(F.broadcast(sup.select("s_suppkey", "s_name")), returned.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


QUERIES = {
    "tpch_q2_min_cost_supplier": q2_min_cost_supplier,
    "tpch_q9_product_type_profit": q9_product_type_profit,
    "tpch_q11_important_part_value": q11_important_part_value,
    "tpch_q12_priority_by_returnflag": q12_priority_by_returnflag,
    "tpch_q16_supplier_cnt_by_part": q16_supplier_cnt_by_part,
    "tpch_q20_excess_share_suppliers": q20_excess_share_suppliers,
    "tpch_q21_waiting_returns": q21_waiting_returns,
}

ORACLES = {
    "tpch_q2_min_cost_supplier": f"""
        WITH regional_sup AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = '{Q2_REGION}'
        ), offers AS (
          SELECT l_partkey, l_suppkey,
                 MIN(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem
          WHERE l_suppkey IN (SELECT s_suppkey FROM regional_sup)
          GROUP BY l_partkey, l_suppkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM offers
        JOIN part ON l_partkey = p_partkey
        JOIN regional_sup ON l_suppkey = s_suppkey
        WHERE p_type = '{Q2_TYPE}'
          AND unit_cost = (
            SELECT MIN(unit_cost) FROM offers o2 WHERE o2.l_partkey = offers.l_partkey
          )
    """,
    "tpch_q9_product_type_profit": f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))
                        - CAST({Q9_COST_FACTOR} * p_retailprice * l_quantity AS DECIMAL(28,4)))
                    AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%{Q9_NAME_FRAGMENT}%'
        GROUP BY 1, 2
    """,
    "tpch_q11_important_part_value": f"""
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS part_value
          FROM lineitem
          WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '{Q11_REGION}'
          )
          GROUP BY l_partkey
        )
        SELECT l_partkey, part_value
        FROM per_part
        WHERE part_value > {Q11_FRACTION} * (
          SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,4))) AS DOUBLE) FROM per_part
        )
    """,
    "tpch_q12_priority_by_returnflag": f"""
        SELECT l_returnflag,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
        GROUP BY l_returnflag
    """,
    "tpch_q16_supplier_cnt_by_part": f"""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> '{Q16_EXCLUDE_BRAND}'
          AND p_type <> 'PROMO'
          AND p_size IN {Q16_SIZES}
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_COMPLAINT_BAL}
          )
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q20_excess_share_suppliers": f"""
        WITH per_ps AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS supp_qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
            AND l_shipdate < TIMESTAMP '{Q20_YEAR_END}'
          GROUP BY l_partkey, l_suppkey
        ), per_part AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(supp_qty AS DECIMAL(28,2))) AS DOUBLE) AS part_qty
          FROM per_ps GROUP BY l_partkey
        )
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{Q20_REGION}'
          AND s_suppkey IN (
            SELECT l_suppkey FROM per_ps
            JOIN per_part USING (l_partkey)
            WHERE supp_qty > {Q20_SHARE} * part_qty
          )
    """,
    "tpch_q21_waiting_returns": """
        SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
        FROM lineitem l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
    """,
}
