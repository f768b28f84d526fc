"""Advanced relational operators: as-of join, rollup, set ops, exact
percentiles. Each with a DuckDB oracle twin.

As-of join is the canonical "Spark lacks it natively" operator: we
implement it as union + last-non-null window (one shuffle on the
join key, no range explosion), and check it against DuckDB's native
ASOF JOIN — a strong cross-engine semantic test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_micros, event_time_seconds
from searchengine_spark.io import load_table


def asof_join_last_event(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    right_ts_alias: str = "matched_ts",
) -> DataFrame:
    """For each left row, the greatest right.ts <= left.ts per key.

    Implementation: tag and union both sides, sort per key by
    (ts, tag) with right rows first on ties, and carry the last seen
    right timestamp forward with last(ignorenulls) — a single shuffle
    on the key, linear state, no range-join blowup. This is the
    scalable shape for billions of rows; a range join would explode.
    """
    l_tagged = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_tag"), F.col("event_id")
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_tag"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    unioned = l_tagged.unionByName(r_tagged).withColumn(
        "_r_ts", F.when(F.col("_tag") == 0, F.col(ts))
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(right_ts_alias, F.last("_r_ts", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .drop("_tag", "_r_ts")
    )


def q_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent prior signup."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup")
    joined = asof_join_last_event(
        purchases, signups, key="user_id", right_ts_alias="signup_ts"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "signup_ts",
        F.when(
            F.col("signup_ts").isNotNull(),
            event_time_seconds(joined, "ts") - event_time_seconds(joined, "signup_ts"),
        ).alias("gap_seconds"),
    )


ASOF_FWD_TOL_S = 86400  # forward match horizon: 1 day


def asof_join_next_event(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    tolerance_s: int | None = None,
    right_ts_alias: str = "matched_ts",
) -> DataFrame:
    """FORWARD as-of: for each left row, the smallest right.ts >=
    left.ts per key, optionally only within ``tolerance_s`` (pandas
    merge_asof direction='forward', tolerance=...). Same single-
    shuffle union trick as asof_join_last_event, mirrored: left rows
    sort BEFORE right rows on ts ties (so an exactly-simultaneous
    right row matches), and first(ignorenulls) looks FORWARD."""
    l_tagged = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_tag"), F.col("event_id")
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_tag"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    unioned = l_tagged.unionByName(r_tagged).withColumn(
        "_r_ts", F.when(F.col("_tag") == 0, F.col(ts))
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = (
        unioned.withColumn(
            right_ts_alias, F.first("_r_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("_tag") == 1)
        .drop("_tag", "_r_ts")
    )
    if tolerance_s is not None:
        gap_us = event_time_micros(out, right_ts_alias) - event_time_micros(
            out, ts
        )
        out = out.withColumn(
            right_ts_alias,
            F.when(gap_us <= tolerance_s * 1_000_000, F.col(right_ts_alias)),
        )
    return out


def q_asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each signup matched to the user's NEXT purchase within 1 day —
    the time-to-convert question the backward as-of can't answer.
    The nearest following purchase is the MIN of the tolerance-
    filtered set, so the window implementation and the oracle's
    LEFT JOIN + MIN agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join_next_event(
        signups,
        purchases,
        tolerance_s=ASOF_FWD_TOL_S,
        right_ts_alias="purchase_ts",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_ts",
        F.when(
            F.col("purchase_ts").isNotNull(),
            event_time_seconds(joined, "purchase_ts")
            - event_time_seconds(joined, "ts"),
        ).alias("secs_to_convert"),
    )


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,2)"))
        .cast("double")
        .alias("sum_price"),
    )


def q_active_not_churned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: customers ordering in the first half of the date range
    INTERSECT second half, plus EXCEPT as churned."""
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        "o_custkey"
    ).distinct()
    late = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "o_custkey"
    ).distinct()
    retained = early.intersect(late).withColumn("status", F.lit("retained"))
    churned = early.exceptAll(late).distinct().withColumn("status", F.lit("churned"))
    return retained.unionByName(churned)


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): the four lineitem measures melted to
    (key, measure, value) rows — the missing half of the pivot pair
    (rel_pivot_segment_status is the wide direction). Map-only: the
    4x row expansion happens per input row with no shuffle, so it
    runs at scan bandwidth at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=list(_UNPIVOT_MEASURES),
        variableColumnName="measure",
        valueColumnName="value",
    )


def q_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles per return flag (sort-based)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("p75"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clipped) value stats per event type — the
    standard robust-aggregation step before feeding noisy metrics to
    a training pipeline: outliers are clamped to the tail quantiles,
    not dropped, so totals stay comparable across types.

    Two passes over events: exact per-type percentiles (sort-based
    within group), broadcast the tiny (type, lo, hi) cut table back,
    clip + aggregate. Cutoffs are rounded to 6 decimals BEFORE the
    comparison so the Spark and DuckDB sides clip against the exact
    same constants (percentile interpolation may differ in the last
    ulp between engines). At 100 TB swap the exact percentile for
    `operators/approx.py`'s KLL `approx_percentile` — same topology,
    no per-group sort."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    cuts = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi"),
    )
    clipped = ev.join(F.broadcast(cuts), "event_type").withColumn(
        "cv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("cv").cast("decimal(28,6)")).cast("double").alias("clipped_sum"),
        F.sum(
            F.when(
                (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_clipped"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
    )


# robust-z cutoff: 3.5 (Iglewicz & Hoaglin 1993) x 1.4826 (the
# MAD-to-sigma consistency constant for normal data) = 5.1891 exactly
# — kept as one decimal literal so both engines compare against the
# identical double.
MAD_CUT = 5.1891


def q_events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median + MAD (median absolute deviation) + robust-outlier count
    per event type — the dispersion gate a single corrupt extreme
    value cannot poison, unlike the mean/std z-score family
    (events_anomaly_zscore): median and MAD both have a 50% breakdown
    point. Three keyed passes, each the winsorized-clip shape (exact
    per-type percentile, tiny cut table broadcast back onto the
    scan); every cutoff is rounded to 6 decimals before comparison so
    the outlier boundary is identical cross-engine. At 100 TB swap
    the exact percentiles for the KLL approx_percentile — same
    topology, no per-group sort."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.round(F.abs(F.col("value") - F.col("med")), 6)
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad")
    )
    flagged = dev.drop("med").join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.col("adev") > F.round(F.lit(MAD_CUT) * F.col("mad"), 6),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .select("event_type", "n_events", "med", "mad", "n_outliers")
    )


def q_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution per purchase: which of the user's
    views inside the 30-minute window get credit, under the three
    standard models at once — first-touch (earliest view), last-touch
    (latest view), linear (1/n each). The conversion-credit twin of
    rel_interval_clicks_before_purchase: same equi-key + time-bound
    residual join shape, then one per-purchase window over the
    handful of touches (per-group, never data-global).

    Deterministic touch ordering: (view ts, view event_id)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    touches = p.join(v, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr(f"INTERVAL {INTERVAL_MINUTES} MINUTE"))
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.asc("v_ts"), F.asc("view_id")
    )
    ranked = touches.select(
        "purchase_id",
        "user_id",
        "view_id",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id")).alias("n_touches"),
    )
    return ranked.groupBy("purchase_id", "user_id", "n_touches").agg(
        F.max(F.when(F.col("rk") == 1, F.col("view_id"))).alias("first_touch_view"),
        F.max(
            F.when(F.col("rk") == F.col("n_touches"), F.col("view_id"))
        ).alias("last_touch_view"),
        F.round(F.lit(1.0) / F.col("n_touches"), 6).alias("linear_credit"),
    )


INTERVAL_MINUTES = 30


def q_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (time-range) join: for each purchase, count the same
    user's clicks in the preceding 30 minutes.

    Executes as an equi hash join on user_id with the time bounds as a
    residual filter — the scalable shape when the equi key has high
    cardinality (per-user event lists are short). If there were no
    equi key, the scale path is bucketing both sides by
    floor(ts / interval) and joining each bucket to itself and its
    neighbor; here user_id already bounds the blowup, so the simple
    plan is the right one.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts")
    )
    lower = F.col("ts") - F.expr(f"INTERVAL {INTERVAL_MINUTES} MINUTES")
    return (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") <= F.col("ts"))
            & (F.col("click_ts") > lower),
            "left",
        )
        .groupBy("event_id", "user_id", "ts")
        .agg(F.count("click_ts").alias("n_clicks"))
    )


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — arbitrary subtotal combinations that
    neither ROLLUP nor CUBE express: totals by (flag, status), by
    flag alone, and by status alone, but NO grand total. One pass;
    Spark expands the sets with a single Expand node feeding one
    hash aggregate (same shape as cube/rollup — no extra scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        FROM _gs_lineitem
        GROUP BY GROUPING SETS (
          (l_returnflag, l_linestatus), (l_returnflag), (l_linestatus)
        )
        """
    )


HIST_BIN_WIDTH = 5000.0


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (binning) over lineitem prices —
    the profiling primitive behind every distribution dashboard.
    One scan + one tiny-key shuffle (bin count ~ price range / width);
    bins are floor(x / width) so empty bins simply don't appear."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / HIST_BIN_WIDTH).alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n_items"))
        .withColumn("bin_lo", F.col("bin") * HIST_BIN_WIDTH)
    )


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling operator: one output row per profiled column
    with null count, distinct count, min/max (as strings — one schema
    for every column type). All columns profile in a single scan
    (one multi-agg), then unpivot driver-free via stack().

    ensure_min_partitions (r14; guide §2.5 input skew): the orders
    table is one parquet file at bench scale, so the 20-function
    multi-agg — including the 5-way countDistinct Expand — ran its
    entire partial-aggregation pass on ONE core (measured 3.5-4.4 s
    of single-task time). The repartition costs one round-robin
    exchange of the scan and parallelizes everything above it."""
    from searchengine_spark.io import ensure_min_partitions

    orders = ensure_min_partitions(load_table(spark, sf_dir, "orders"))
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    aggs = []
    for c in cols:
        # doubles stringify via DECIMAL so both engines render the
        # same text (Java switches to scientific notation at 1e7)
        sc = (
            F.col(c).cast("decimal(18,2)").cast("string")
            if dict(orders.dtypes)[c] == "double"
            else F.col(c).cast("string")
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(sc).alias(f"{c}__min"),
            F.max(sc).alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_str, max_str)"
    )


def q_ntile_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE: equal-count quartiles of customers by account balance
    (deterministic tie-break on custkey), profiled per tier — the
    window-function way to bin when bin POPULATIONS must be equal
    (vs rel_price_histogram's equal-WIDTH bins).

    Scale caveat (visible as Spark's WindowExec warning): an
    UNPARTITIONED window moves all rows to one task — exact global
    NTILE does not scale past one executor's memory. At 100 TB the
    equal-count path is operators/approx.equal_count_bins
    (approx_percentile cutpoints + map-only CASE binning); this exact
    form is for dimension-sized inputs (customers here), kept as the
    oracle-checkable ground truth — tests/test_approx.py checks the
    approximate bins against it."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("tier", F.ntile(4).over(w).cast("bigint"))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


def q_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each BUILDING-segment customer's
    two largest orders — the join family for 'top-N related rows per
    outer row'. Spark decorrelates this into a ranked join under the
    hood; expressing it as LATERAL keeps the per-outer-row LIMIT
    semantics explicit (and matches DuckDB's native LATERAL)."""
    load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).createOrReplaceTempView("_lat_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM _lat_cust c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM _lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
          LIMIT 2
        ) t
        """
    )


QUERIES = {
    "rel_lateral_top2_orders": q_lateral_top2_orders,
    "rel_ntile_customer_value": q_ntile_customer_value,
    "rel_asof_purchase_signup": q_asof_purchase_signup,
    "rel_asof_forward_next_purchase": q_asof_forward_next_purchase,
    "rel_interval_clicks_before_purchase": q_clicks_before_purchase,
    "rel_grouping_sets_revenue": q_grouping_sets_revenue,
    "rel_price_histogram": q_price_histogram,
    "rel_profile_orders": q_profile_orders,
    "rel_rollup_revenue": q_rollup_revenue,
    "rel_retained_churned": q_active_not_churned,
    "rel_price_quartiles": q_price_quartiles,
    "rel_unpivot_lineitem": q_unpivot_lineitem_measures,
    "events_value_mad": q_events_value_mad,
    "events_winsorized_stats": q_winsorized_event_stats,
    "events_attribution_credit": q_attribution_credit,
}

_UNPIVOT_ORACLE = "\nUNION ALL\n".join(
    f"SELECT l_orderkey, l_linenumber, '{m}' AS measure, "
    f"CAST({m} AS DOUBLE) AS value FROM lineitem"
    for m in _UNPIVOT_MEASURES
)

ORACLES = {
    "rel_unpivot_lineitem": _UNPIVOT_ORACLE,
    "events_attribution_credit": f"""
        WITH touches AS (
          SELECT p.event_id AS purchase_id, p.user_id,
                 v.event_id AS view_id, v.ts AS v_ts
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON p.user_id = v.user_id
           AND v.ts <= p.ts
           AND v.ts > p.ts - INTERVAL {INTERVAL_MINUTES} MINUTE
        ),
        ranked AS (
          SELECT purchase_id, user_id, view_id,
                 row_number() OVER (
                   PARTITION BY purchase_id ORDER BY v_ts ASC, view_id ASC
                 ) AS rk,
                 COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
          FROM touches
        )
        SELECT purchase_id, user_id,
               CAST(n_touches AS BIGINT) AS n_touches,
               MAX(CASE WHEN rk = 1 THEN view_id END) AS first_touch_view,
               MAX(CASE WHEN rk = n_touches THEN view_id END) AS last_touch_view,
               round(1.0 / n_touches, 6) AS linear_credit
        FROM ranked GROUP BY purchase_id, user_id, n_touches
    """,
    "events_value_mad": """
        WITH ev AS (
          SELECT event_type, value FROM events WHERE value IS NOT NULL
        ),
        med AS (
          SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
          FROM ev GROUP BY event_type
        ),
        dev AS (
          SELECT e.event_type, m.med,
                 round(abs(e.value - m.med), 6) AS adev
          FROM ev e JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type, med,
                 round(quantile_cont(adev, 0.5), 6) AS mad
          FROM dev GROUP BY event_type, med
        )
        SELECT d.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(m.med) AS med,
               MAX(m.mad) AS mad,
               CAST(SUM(CASE WHEN d.adev > round(5.1891 * m.mad, 6)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type
    """,
    "events_winsorized_stats": """
        WITH ev AS (
          SELECT event_type, value FROM events WHERE value IS NOT NULL
        ),
        cuts AS (
          SELECT event_type,
                 round(quantile_cont(value, 0.05), 6) AS lo,
                 round(quantile_cont(value, 0.95), 6) AS hi
          FROM ev GROUP BY event_type
        )
        SELECT e.event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(least(greatest(e.value, c.lo), c.hi)
                             AS DECIMAL(28,6))) AS DOUBLE) AS clipped_sum,
               CAST(SUM(CASE WHEN e.value < c.lo OR e.value > c.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
               MAX(c.lo) AS lo, MAX(c.hi) AS hi
        FROM ev e JOIN cuts c USING (event_type)
        GROUP BY e.event_type
    """,
    "rel_lateral_top2_orders": """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
          LIMIT 2
        ) t
    """,
    "rel_ntile_customer_value": """
        SELECT tier, COUNT(*) AS n_cust,
               MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
        FROM (
          SELECT c_acctbal,
                 NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS tier
          FROM customer
        )
        GROUP BY tier
    """,
    "rel_interval_clicks_before_purchase": f"""
        SELECT p.event_id, p.user_id, p.ts, COUNT(c.click_ts) AS n_clicks
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.click_ts <= p.ts
         AND c.click_ts > p.ts - INTERVAL {INTERVAL_MINUTES} MINUTE
        GROUP BY p.event_id, p.user_id, p.ts
    """,
    "rel_price_histogram": f"""
        SELECT CAST(floor(l_extendedprice / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
               COUNT(*) AS n_items,
               CAST(floor(l_extendedprice / {HIST_BIN_WIDTH}) AS BIGINT) * {HIST_BIN_WIDTH} AS bin_lo
        FROM lineitem
        GROUP BY 1
    """,
    "rel_profile_orders": """
        SELECT 'o_orderkey' AS column_name,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               MIN(CAST(o_orderkey AS VARCHAR)) AS min_str,
               MAX(CAST(o_orderkey AS VARCHAR)) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_custkey',
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_custkey),
               MIN(CAST(o_custkey AS VARCHAR)), MAX(CAST(o_custkey AS VARCHAR))
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderstatus),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_totalprice),
               MIN(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)),
               MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR))
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderpriority),
               MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders
    """,
    "rel_grouping_sets_revenue": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS (
          (l_returnflag, l_linestatus), (l_returnflag), (l_linestatus)
        )
    """,
    "rel_asof_purchase_signup": """
        SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts,
               CASE WHEN s.ts IS NOT NULL
                    THEN (epoch_us(p.ts) // 1000000) - (epoch_us(s.ts) // 1000000)
               END AS gap_seconds
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    "rel_asof_forward_next_purchase": f"""
        SELECT s.event_id, s.user_id, s.ts,
               MIN(p.ts) AS purchase_ts,
               CASE WHEN MIN(p.ts) IS NOT NULL
                    THEN (epoch_us(MIN(p.ts)) // 1000000)
                         - (epoch_us(s.ts) // 1000000)
               END AS secs_to_convert
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = s.user_id AND p.ts >= s.ts
         AND epoch_us(p.ts) - epoch_us(s.ts) <= {ASOF_FWD_TOL_S * 1_000_000}
        GROUP BY s.event_id, s.user_id, s.ts
    """,
    "rel_rollup_revenue": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "rel_retained_churned": """
        WITH early AS (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        ),
        late AS (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        )
        SELECT o_custkey, 'retained' AS status FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
        UNION ALL
        SELECT o_custkey, 'churned' AS status FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
    """,
    "rel_price_quartiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
               round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag
    """,
}
