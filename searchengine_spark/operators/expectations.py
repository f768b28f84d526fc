"""Declarative data-quality expectations (Deequ-style, one pass).

The contract layer between pipeline stages: assert what a table must
look like (keys unique, measures in range, enums closed, volume
sane) and get per-constraint metrics + verdicts from ONE aggregation
pass — never one job per check, which at 100 TB turns a 10-constraint
suite into 10 full scans. Schorn et al.'s Deequ (VLDB'18) is the
public reference for the pattern; this is its minimal Spark-native
core: every constraint contributes aggregate expressions to a single
`agg(...)`, and the verdict table is derived from the one result row.

Output shape (constraint, metric, passed) is long-form so the
verifier can hash it and a monitor can diff it across runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table


class Check:
    """A named constraint: aggregate metric expression + pass rule."""

    def __init__(self, name: str, metric: Column, passes: Column):
        self.name = name
        self.metric = metric.cast("double").alias(f"m_{name}")
        self.passes = passes


def completeness(col: str, *, at_least: float = 1.0) -> Check:
    m = F.avg(F.when(F.col(col).isNotNull(), 1.0).otherwise(0.0))
    return Check(
        f"completeness_{col}", m, F.col(f"m_completeness_{col}") >= at_least
    )


def uniqueness(col: str) -> Check:
    m = F.countDistinct(col) / F.count(F.lit(1))
    return Check(f"uniqueness_{col}", m, F.col(f"m_uniqueness_{col}") >= 1.0)


def non_negative(col: str) -> Check:
    m = F.sum(F.when(F.col(col) < 0, 1).otherwise(0))
    return Check(f"non_negative_{col}", m, F.col(f"m_non_negative_{col}") == 0.0)


def in_set(col: str, allowed: list[str]) -> Check:
    m = F.sum(F.when(F.col(col).isin(allowed) | F.col(col).isNull(), 0).otherwise(1))
    return Check(f"in_set_{col}", m, F.col(f"m_in_set_{col}") == 0.0)


def min_rows(n: int) -> Check:
    m = F.count(F.lit(1))
    return Check("min_rows", m, F.col("m_min_rows") >= float(n))


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(constraint, metric, passed) — one aggregation job for all."""
    agged = df.agg(*[c.metric for c in checks])
    rows = [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.round(F.col(f"m_{c.name}"), 6).alias("metric"),
            c.passes.alias("passed"),
        )
        for c in checks
    ]
    return agged.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.constraint", "r.metric", "r.passed"
    )


def ts_in_range(col_secs: Column, name: str, lo_s: int, hi_s: int) -> Check:
    """Event-time freshness/sanity: count of rows whose epoch-seconds
    fall outside [lo_s, hi_s) — the temporal contract a windowed
    pipeline assumes (a 1970 default or a far-future clock skew lands
    here, not silently in some watermark's discard pile). Takes the
    PRE-BUILT seconds column so callers route through the
    flavor-agnostic event_time helpers."""
    m = F.sum(
        F.when((col_secs < lo_s) | (col_secs >= hi_s), 1).otherwise(0)
    )
    return Check(name, m, F.col(f"m_{name}") == 0.0)


# --------------------------------------------------------------- queries

ORDER_STATUSES = ["O", "F", "P"]
MIN_ORDER_ROWS = 100

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
EVENTS_TS_LO = 1704067200  # 2024-01-01T00:00:00Z
EVENTS_TS_HI = 1706745600  # 2024-02-01T00:00:00Z
MIN_EVENT_ROWS = 500


def q_events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contract the streaming topologies assume of `events`:
    unique non-null event ids, closed type enum, non-negative value,
    and — the check the orders suite has no analog for — event time
    confined to the expected month, via the flavor-agnostic epoch
    seconds (a nanos/NTZ drift or an epoch-default ts trips it
    before a watermark silently eats the rows)."""
    from searchengine_spark.event_time import event_time_seconds

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("_ts_s", event_time_seconds(ev, "ts"))
    return run_checks(
        ev,
        [
            completeness("event_id"),
            uniqueness("event_id"),
            completeness("user_id"),
            in_set("event_type", EVENT_TYPES),
            non_negative("value"),
            ts_in_range(
                F.col("_ts_s"), "ts_in_month", EVENTS_TS_LO, EVENTS_TS_HI
            ),
            min_rows(MIN_EVENT_ROWS),
        ],
    )


EMB_DIM_EXPECTED = 64
EMB_NORM_LO, EMB_NORM_HI = 0.99, 1.01  # squared-norm band for unit vectors
MIN_EMB_ROWS = 100


def q_embeddings_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-quality DQ — the broken-encoder contract: a crashed or
    truncated embedding job shows up as nulls, wrong dimensionality,
    NaN elements, or zero/denormalized vectors, and every ANN
    structure downstream (LSH, IVF, PQ) silently degrades instead of
    failing. One pass over array-typed columns: each constraint's
    metric is a VIOLATION COUNT (exact integers cross-engine; the
    norm band is only ever compared, never emitted, and real vectors
    sit ~1e-7 from 1.0 — nowhere near the 0.99/1.01 boundaries, so
    float ulp cannot flip a count)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm_sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    has_nan = F.exists("embedding", lambda x: F.isnan(x))
    ev = emb.select(
        "vec_id",
        "embedding",
        norm_sq.alias("_nsq"),
        has_nan.alias("_nan"),
    )
    checks = [
        completeness("embedding"),
        Check(
            "dim_is_expected",
            F.sum(
                F.when(
                    F.size("embedding") != EMB_DIM_EXPECTED, 1
                ).otherwise(0)
            ),
            F.col("m_dim_is_expected") == 0.0,
        ),
        Check(
            "no_nan_elements",
            F.sum(F.when(F.col("_nan"), 1).otherwise(0)),
            F.col("m_no_nan_elements") == 0.0,
        ),
        Check(
            "unit_norm_band",
            F.sum(
                F.when(
                    (F.col("_nsq") < EMB_NORM_LO)
                    | (F.col("_nsq") > EMB_NORM_HI),
                    1,
                ).otherwise(0)
            ),
            F.col("m_unit_norm_band") == 0.0,
        ),
        uniqueness("vec_id"),
        min_rows(MIN_EMB_ROWS),
    ]
    return run_checks(ev, checks)


def q_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contract a downstream join pipeline assumes of `orders`:
    unique non-null key, non-negative money, closed status enum,
    sane volume — verified in one scan."""
    orders = load_table(spark, sf_dir, "orders")
    return run_checks(
        orders,
        [
            completeness("o_orderkey"),
            uniqueness("o_orderkey"),
            completeness("o_custkey"),
            non_negative("o_totalprice"),
            in_set("o_orderstatus", ORDER_STATUSES),
            min_rows(MIN_ORDER_ROWS),
        ],
    )


def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table DQ: the orders <-> lineitem foreign-key contract a
    star-schema pipeline assumes. Orphans (facts whose key misses the
    dim) and childless parents are each ONE anti-join keyed on the
    same orderkey the downstream joins shuffle on — auditing costs
    exactly one extra pass over each table, no new shuffle key. The
    four counts combine lazily via broadcast crossJoins (no collect).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_orders = orders.agg(F.count(F.lit(1)).alias("n_orders"))
    n_lineitems = li.agg(F.count(F.lit(1)).alias("n_lineitems"))
    orphans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    childless = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("childless_orders"))
    )
    return (
        n_orders.crossJoin(F.broadcast(n_lineitems))
        .crossJoin(F.broadcast(orphans))
        .crossJoin(F.broadcast(childless))
        .select(
            "n_orders",
            "n_lineitems",
            "orphan_lineitems",
            "childless_orders",
            (
                (F.col("orphan_lineitems") == 0)
                & (F.col("childless_orders") == 0)
            )
            .cast("int")
            .alias("fk_intact"),
        )
    )


import math as _math

# Benford first-digit expectation, computed ONCE in Python so both
# engines compare against the same rounded literals (log10 inside
# either engine would be a per-engine float).
BENFORD_P = {d: round(_math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}
BENFORD_FLAG = 0.02  # |frac - expected| above this marks the digit


def q_benford_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over o_totalprice — the
    classic financial-data fabrication/truncation check (synthetic or
    clipped amounts drift from log10(1+1/d)). First digit comes from
    INTEGER cents (round(x*100) -> bigint -> first char), never from
    float log10/double-to-string formatting, so both engines bucket
    identically. One scan-agg over a 9-value key; expectations are
    Python-computed literals shared with the oracle.

    Deviations on synthetic TPC-H totals are EXPECTED to be large
    (uniform-ish totals are exactly what Benford flags) — the audit
    reports them; the DQ judgement is the flag column.
    """
    from searchengine_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    per = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    tot = per.agg(F.sum("n_orders").alias("_n"))
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in BENFORD_P.items() for x in (d, p)]
        ),
        F.col("digit"),
    )
    frac = F.round(F.col("n_orders") / F.col("_n"), 6)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            frac.alias("frac"),
            expected.alias("benford_expected"),
            F.round(frac - expected, 6).alias("deviation"),
            (F.abs(frac - expected) > F.lit(BENFORD_FLAG)).alias("flagged"),
        )
        .orderBy("digit")
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_P.items()
)

_BENFORD_SQL = f"""
WITH per AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_totalprice > 0
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n FROM per)
SELECT digit, n_orders,
       round(CAST(n_orders AS DOUBLE) / n, 6) AS frac,
       (CASE digit {_BENFORD_CASE} END) AS benford_expected,
       round(round(CAST(n_orders AS DOUBLE) / n, 6)
             - (CASE digit {_BENFORD_CASE} END), 6) AS deviation,
       abs(round(CAST(n_orders AS DOUBLE) / n, 6)
           - (CASE digit {_BENFORD_CASE} END)) > {BENFORD_FLAG} AS flagged
FROM per, tot
ORDER BY digit
"""


QUERIES = {
    "dq_benford_orders": q_benford_orders,
    "dq_orders_expectations": q_orders_expectations,
    "dq_events_expectations": q_events_expectations,
    "dq_embeddings_expectations": q_embeddings_expectations,
    "dq_referential_integrity": q_referential_integrity,
}

_STATUS_SQL = ", ".join(f"'{s}'" for s in ORDER_STATUSES)

_REF_INTEGRITY_SQL = """
SELECT (SELECT count(*) FROM orders)::BIGINT AS n_orders,
       (SELECT count(*) FROM lineitem)::BIGINT AS n_lineitems,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))::BIGINT
         AS orphan_lineitems,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey))::BIGINT
         AS childless_orders,
       CASE WHEN (SELECT count(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey)) = 0
             AND (SELECT count(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                    WHERE l.l_orderkey = o.o_orderkey)) = 0
            THEN 1 ELSE 0 END AS fk_intact
"""

_TYPES_SQL = ", ".join(f"'{t}'" for t in EVENT_TYPES)

_EVENTS_DQ_SQL = f"""
    WITH m AS (
      SELECT
        AVG(CASE WHEN event_id IS NOT NULL THEN 1.0 ELSE 0.0 END) AS c_id,
        COUNT(DISTINCT event_id)::DOUBLE / COUNT(*) AS u_id,
        AVG(CASE WHEN user_id IS NOT NULL THEN 1.0 ELSE 0.0 END) AS c_user,
        CAST(SUM(CASE WHEN event_type IN ({_TYPES_SQL})
                      OR event_type IS NULL THEN 0 ELSE 1 END) AS DOUBLE) AS bad_type,
        CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS DOUBLE) AS neg_value,
        CAST(SUM(CASE WHEN epoch_us(ts) // 1000000 < {EVENTS_TS_LO}
                      OR epoch_us(ts) // 1000000 >= {EVENTS_TS_HI}
                      THEN 1 ELSE 0 END) AS DOUBLE) AS ts_out,
        CAST(COUNT(*) AS DOUBLE) AS n_rows
      FROM events
    )
    SELECT 'completeness_event_id' AS constraint, round(c_id, 6) AS metric, c_id >= 1.0 AS passed FROM m
    UNION ALL
    SELECT 'uniqueness_event_id', round(u_id, 6), u_id >= 1.0 FROM m
    UNION ALL
    SELECT 'completeness_user_id', round(c_user, 6), c_user >= 1.0 FROM m
    UNION ALL
    SELECT 'in_set_event_type', round(bad_type, 6), bad_type = 0.0 FROM m
    UNION ALL
    SELECT 'non_negative_value', round(neg_value, 6), neg_value = 0.0 FROM m
    UNION ALL
    SELECT 'ts_in_month', round(ts_out, 6), ts_out = 0.0 FROM m
    UNION ALL
    SELECT 'min_rows', round(n_rows, 6), n_rows >= {MIN_EVENT_ROWS}.0 FROM m
"""

_EMB_DQ_SQL = f"""
    WITH m AS (
      SELECT
        AVG(CASE WHEN embedding IS NOT NULL THEN 1.0 ELSE 0.0 END) AS c_emb,
        CAST(SUM(CASE WHEN len(embedding) <> {EMB_DIM_EXPECTED} THEN 1 ELSE 0 END) AS DOUBLE) AS bad_dim,
        CAST(SUM(CASE WHEN len(list_filter(embedding, x -> isnan(x))) > 0
                      THEN 1 ELSE 0 END) AS DOUBLE) AS nan_rows,
        CAST(SUM(CASE WHEN list_aggregate(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * x), 'sum') < {EMB_NORM_LO}
                      OR list_aggregate(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * x), 'sum') > {EMB_NORM_HI}
                      THEN 1 ELSE 0 END) AS DOUBLE) AS bad_norm,
        COUNT(DISTINCT vec_id)::DOUBLE / COUNT(*) AS u_id,
        CAST(COUNT(*) AS DOUBLE) AS n_rows
      FROM embeddings
    )
    SELECT 'completeness_embedding' AS constraint, round(c_emb, 6) AS metric, c_emb >= 1.0 AS passed FROM m
    UNION ALL
    SELECT 'dim_is_expected', round(bad_dim, 6), bad_dim = 0.0 FROM m
    UNION ALL
    SELECT 'no_nan_elements', round(nan_rows, 6), nan_rows = 0.0 FROM m
    UNION ALL
    SELECT 'unit_norm_band', round(bad_norm, 6), bad_norm = 0.0 FROM m
    UNION ALL
    SELECT 'uniqueness_vec_id', round(u_id, 6), u_id >= 1.0 FROM m
    UNION ALL
    SELECT 'min_rows', round(n_rows, 6), n_rows >= {MIN_EMB_ROWS}.0 FROM m
"""

ORACLES = {
    "dq_benford_orders": _BENFORD_SQL,
    "dq_events_expectations": _EVENTS_DQ_SQL,
    "dq_embeddings_expectations": _EMB_DQ_SQL,
    "dq_referential_integrity": _REF_INTEGRITY_SQL,
    "dq_orders_expectations": f"""
        WITH m AS (
          SELECT
            AVG(CASE WHEN o_orderkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS c_key,
            COUNT(DISTINCT o_orderkey)::DOUBLE / COUNT(*) AS u_key,
            AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS c_cust,
            CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS DOUBLE) AS neg_price,
            CAST(SUM(CASE WHEN o_orderstatus IN ({_STATUS_SQL})
                          OR o_orderstatus IS NULL THEN 0 ELSE 1 END) AS DOUBLE) AS bad_status,
            CAST(COUNT(*) AS DOUBLE) AS n_rows
          FROM orders
        )
        SELECT 'completeness_o_orderkey' AS constraint, round(c_key, 6) AS metric, c_key >= 1.0 AS passed FROM m
        UNION ALL
        SELECT 'uniqueness_o_orderkey', round(u_key, 6), u_key >= 1.0 FROM m
        UNION ALL
        SELECT 'completeness_o_custkey', round(c_cust, 6), c_cust >= 1.0 FROM m
        UNION ALL
        SELECT 'non_negative_o_totalprice', round(neg_price, 6), neg_price = 0.0 FROM m
        UNION ALL
        SELECT 'in_set_o_orderstatus', round(bad_status, 6), bad_status = 0.0 FROM m
        UNION ALL
        SELECT 'min_rows', round(n_rows, 6), n_rows >= {MIN_ORDER_ROWS}.0 FROM m
    """,
}
