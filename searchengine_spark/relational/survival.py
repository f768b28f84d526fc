"""Survival analysis: Kaplan-Meier time-to-conversion.

The product-limit estimator is the standard readout for "how long
until users convert, given many haven't yet" — naive conversion-rate
cuts (events.py `events_conversion_ab`) understate conversion when
the observation window truncates slow converters. KM handles that
censoring correctly: at each elapsed time t with d_t conversions out
of n_t still-at-risk users, the survival curve multiplies in
(1 - d_t/n_t), and users censored at t leave the risk set without
counting as conversions.

Framing on the synthetic events table: duration = hours from a
user's first `signup` to their first subsequent `purchase`,
administratively censored at a fixed follow-up HORIZON_H (users whose
first purchase lands after the horizon — or never — are censored at
the horizon, exactly like a fixed-follow-up product experiment).

Scale shape (100 TB): two per-user keyed aggregations (first signup,
first qualifying purchase — both shuffles on user_id), a global
1-row max broadcast, then everything else happens on the curve
table, whose size is bounded by the DOMAIN (HORIZON_H + 1 distinct
hour marks), not the data: the at-risk suffix-sum window and the
sorted-factor product fold both run over <= HORIZON_H + 1 rows.
The survival product is a sequential left-to-right fold over the
t-sorted factor array in BOTH engines (Spark `aggregate` over an
array_sort'ed array; DuckDB `list_reduce` over `list(... ORDER BY)`)
— identical IEEE operation order, so the doubles match exactly
before the final round(6).

Reference parity: abh2050/searchengine has no analytics surface;
this extends the experimentation family (relational/experiment.py,
events.py CUPED/z-test) per the 100 TB extension brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_seconds, exact_floor_div
from searchengine_spark.io import load_table

HORIZON_H = 120  # fixed follow-up horizon (hours after signup)
START_EVENT = "signup"
CONVERT_EVENT = "purchase"


def km_curve(
    ev: DataFrame,
    *,
    horizon_h: int = HORIZON_H,
    start_event: str = START_EVENT,
    convert_event: str = CONVERT_EVENT,
) -> DataFrame:
    """(t_hours, at_risk, deaths, n_censored, survival) — the KM
    curve of hours-from-first-`start_event`-to-first-`convert_event`,
    censored at `horizon_h`."""
    secs = event_time_seconds(ev, "ts")
    base = ev.select("user_id", "event_type", secs.alias("s"))

    signup = (
        base.filter(F.col("event_type") == start_event)
        .groupBy("user_id")
        .agg(F.min("s").alias("signup_s"))
    )
    purchase = (
        base.filter(F.col("event_type") == convert_event)
        .join(signup, "user_id")
        .filter(F.col("s") >= F.col("signup_s"))
        .groupBy("user_id")
        .agg(F.min("s").alias("purch_s"))
    )
    raw_h = exact_floor_div(F.col("purch_s") - F.col("signup_s"), 3600)
    lives = (
        signup.join(purchase, "user_id", "left")
        .withColumn("raw_h", raw_h)
        .select(
            "user_id",
            F.when(
                F.col("raw_h").isNotNull() & (F.col("raw_h") <= horizon_h),
                F.col("raw_h"),
            )
            .otherwise(F.lit(horizon_h))
            .alias("t_hours"),
            (
                F.col("raw_h").isNotNull() & (F.col("raw_h") <= horizon_h)
            )
            .cast("int")
            .alias("event"),
        )
    )
    per_t = lives.groupBy("t_hours").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("event").cast("bigint").alias("deaths"),
        F.sum(1 - F.col("event")).cast("bigint").alias("n_censored"),
    )
    # at_risk(t) = users whose duration >= t = suffix sum of m. The
    # window is single-partition but over <= horizon_h + 1 rows —
    # domain-bounded, not data-bounded.
    risk_win = Window.orderBy("t_hours").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    fac = per_t.withColumn(
        "at_risk", F.sum("m").over(risk_win).cast("bigint")
    ).withColumn(
        "f",
        (F.col("at_risk") - F.col("deaths")).cast("double")
        / F.col("at_risk").cast("double"),
    )
    arr = fac.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("t_hours").alias("t"), F.col("f")))
        ).alias("_arr")
    )
    return (
        fac.crossJoin(F.broadcast(arr))
        .select(
            "t_hours",
            "at_risk",
            "deaths",
            "n_censored",
            F.round(
                F.aggregate(
                    F.filter(
                        F.col("_arr"), lambda x: x["t"] <= F.col("t_hours")
                    ),
                    F.lit(1.0),
                    lambda acc, x: acc * x["f"],
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("t_hours")
    )


def q_events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    return km_curve(load_table(spark, sf_dir, "events"))


_KM_SQL = f"""
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS s FROM events
), signup AS (
  SELECT user_id, min(s) AS signup_s
  FROM base WHERE event_type = '{START_EVENT}' GROUP BY user_id
), purchase AS (
  SELECT b.user_id, min(b.s) AS purch_s
  FROM base b JOIN signup g ON b.user_id = g.user_id
  WHERE b.event_type = '{CONVERT_EVENT}' AND b.s >= g.signup_s
  GROUP BY b.user_id
), lives AS (
  SELECT g.user_id,
         CASE WHEN p.purch_s IS NOT NULL
                   AND (p.purch_s - g.signup_s) // 3600 <= {HORIZON_H}
              THEN (p.purch_s - g.signup_s) // 3600
              ELSE {HORIZON_H} END AS t_hours,
         CASE WHEN p.purch_s IS NOT NULL
                   AND (p.purch_s - g.signup_s) // 3600 <= {HORIZON_H}
              THEN 1 ELSE 0 END AS event
  FROM signup g LEFT JOIN purchase p ON g.user_id = p.user_id
), per_t AS (
  SELECT t_hours,
         count(*) AS m,
         CAST(sum(event) AS BIGINT) AS deaths,
         CAST(sum(1 - event) AS BIGINT) AS n_censored
  FROM lives GROUP BY t_hours
), fac AS (
  SELECT t_hours, deaths, n_censored,
         CAST(SUM(m) OVER (ORDER BY t_hours
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS at_risk
  FROM per_t
), fac2 AS (
  SELECT t_hours, at_risk, deaths, n_censored,
         CAST(at_risk - deaths AS DOUBLE) / CAST(at_risk AS DOUBLE) AS f
  FROM fac
), arr AS (
  SELECT list(struct_pack(t := t_hours, f := f) ORDER BY t_hours) AS a
  FROM fac2
)
SELECT fac2.t_hours, fac2.at_risk, fac2.deaths, fac2.n_censored,
       round(list_reduce(
               list_prepend(CAST(1.0 AS DOUBLE),
                 list_transform(
                   list_filter(arr.a, x -> x.t <= fac2.t_hours),
                   x -> x.f)),
               (p, q) -> p * q), 6) AS survival
FROM fac2, arr
ORDER BY fac2.t_hours
"""

QUERIES = {"events_survival_km": q_events_survival_km}
ORACLES = {"events_survival_km": _KM_SQL}
