"""Exponentially time-decayed event counts (trending / burst scores).

The streaming-analytics staple the reference's batch queries lack:
"what is hot RIGHT NOW" needs recency-weighted counts, not lifetime
totals. Each event contributes weight 2^(-age/half_life), evaluated at
two half-lives — a fast clock (6 h) and a slow clock (48 h) — and the
fast/slow ratio is the burst score: a type whose activity is
front-loaded toward the present scores high, a steadily-declining one
scores low.

Scale shape: a single scan with map-side partial aggregation into a
handful of (event_type) groups — no window functions, no second pass;
the anchor timestamp (corpus max) is a broadcast 1-row frame, never a
driver collect. On a true stream the same arithmetic runs as an
incremental state update (decayed_count' = decayed_count *
decay(delta_t) + 1), so the batch twin here doubles as the replay
oracle for that path.

Cross-engine float discipline: the decay constant -ln2/HL is computed
ONCE in Python and embedded as the same literal in both engines (JVM
Math.exp and DuckDB libm exp disagree in the last ulp on ~10% of args
— measured), and every per-row weight is cast to DECIMAL(18,6) before
summing: a 1-ulp double disagreement flips a 6-decimal cast with
probability ~1e-10 per row, and the decimal sums themselves are exact
and order-independent.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_seconds
from searchengine_spark.io import load_table

HALF_LIFE_FAST_H = 6.0
HALF_LIFE_SLOW_H = 48.0
# Per-second decay rates, embedded as identical literals in both engines.
LAMBDA_FAST = -math.log(2.0) / (HALF_LIFE_FAST_H * 3600.0)
LAMBDA_SLOW = -math.log(2.0) / (HALF_LIFE_SLOW_H * 3600.0)


def decayed_weight(age_seconds_col, lam: float):
    """exp(lam * age) quantized to DECIMAL(18,6) for order-independent,
    cross-engine-stable summation."""
    return F.exp(F.lit(lam) * age_seconds_col.cast("double")).cast(
        "decimal(18,6)"
    )


def q_events_decayed_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", "value", event_time_seconds(ev).alias("s")
    )
    anchor = base.agg(F.max("s").alias("max_s"))
    age = F.col("max_s") - F.col("s")
    w_fast = decayed_weight(age, LAMBDA_FAST)
    w_slow = decayed_weight(age, LAMBDA_SLOW)
    agg = (
        base.crossJoin(F.broadcast(anchor))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(w_fast).alias("nf"),
            F.sum(w_slow).alias("ns"),
            # DECIMAL(18,6) x DECIMAL(18,6) -> DECIMAL(37,12): exact in
            # both engines, below Spark's 38-precision loss cliff.
            F.sum(F.col("value").cast("decimal(18,6)") * w_fast).alias("vf"),
        )
    )
    ns_d = F.col("ns").cast("double")
    return agg.select(
        "event_type",
        "n_events",
        F.round(F.col("nf").cast("double"), 6).alias("decayed_n_fast"),
        F.round(ns_d, 6).alias("decayed_n_slow"),
        F.round(F.col("vf").cast("double"), 6).alias("decayed_value_fast"),
        F.when(F.col("ns") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("nf").cast("double") / ns_d, 6))
        .alias("burst_ratio"),
    ).orderBy("event_type")


_TRENDING_SQL = f"""
WITH base AS (
  SELECT event_type, value, (epoch_us(ts) // 1000000) AS s FROM events
),
anchor AS (SELECT max(s) AS max_s FROM base),
weighted AS (
  SELECT event_type, value,
         CAST(exp({LAMBDA_FAST!r} * (max_s - s)::DOUBLE) AS DECIMAL(18,6)) AS wf,
         CAST(exp({LAMBDA_SLOW!r} * (max_s - s)::DOUBLE) AS DECIMAL(18,6)) AS ws
  FROM base CROSS JOIN anchor
),
agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n_events,
         sum(wf) AS nf,
         sum(ws) AS ns,
         sum(CAST(value AS DECIMAL(18,6)) * wf) AS vf
  FROM weighted GROUP BY event_type
)
SELECT event_type, n_events,
       round(nf::DOUBLE, 6) AS decayed_n_fast,
       round(ns::DOUBLE, 6) AS decayed_n_slow,
       round(vf::DOUBLE, 6) AS decayed_value_fast,
       CASE WHEN ns = 0 THEN 0.0 ELSE round(nf::DOUBLE / ns::DOUBLE, 6) END
         AS burst_ratio
FROM agg
ORDER BY event_type
"""

QUERIES = {"events_decayed_trending": q_events_decayed_trending}
ORACLES = {"events_decayed_trending": _TRENDING_SQL}
