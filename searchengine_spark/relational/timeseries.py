"""Time-series analytics: rolling distinct actives, EWMA smoothing,
and a chi-square independence audit.

Three shapes every product-metrics / data-drift pipeline needs that
the windowed-analytics family (relational/events.py) doesn't cover:

- **Rolling 7-day active users** — distinct-count over a sliding
  window. Distinct-count windows don't exist in Spark, and the naive
  self-join (days x events) rescans the fact table per day. The scale
  shape used here: dedup to (user, day) once, explode each user-day
  to the <= 7 report days it supports (bounded fan-out, map-side),
  dedup again, and count per day. Work is O(|user-days| * 7), one
  shuffle keyed on (user, report_day) — no per-day rescan, no window
  over the fact table. At 100 TB you'd swap the exact distinct for
  an HLL merge (operators/approx.py shows the sketch shape); the
  explode-to-window-days trick is the same.

- **EWMA smoothing** of the hourly value series per event type —
  the standard anomaly-baseline smoother. Recursive EWMA is a
  sequential scan; the scalable form is the truncated window:
  ewma_t = (1-a) * sum_{j=0..W-1} a^j x_{t-j} with W chosen so
  a^W is negligible. That is W lag() terms over a per-type window —
  pure whole-stage codegen, partitioned by event_type (bounded
  series per partition: hours, not events). Hourly sums are
  decimal-exact before the float smoothing so the result is
  order-independent; weights are shared Python literals so both
  engines fold the same constants.

- **Chi-square independence** of event_type x hour-of-day — the
  drift monitor's categorical cousin (text_drift_psi covers the
  token distribution). Two tiny aggs (cell counts, marginals via
  window over the |types| x 24 cell table) and a decimal-cast sum of
  per-cell contributions so the statistic is order-independent.

Reference scope: abh2050/searchengine has no time-series surface;
these extend the engine the way BASELINE.md's "analytics engine"
framing requires (grid/anomaly/trend family: relational/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from searchengine_spark.event_time import event_time_seconds, exact_floor_div
from searchengine_spark.io import load_table

ROLLING_DAYS = 7

EWMA_ALPHA = 0.6  # decay per step back
EWMA_WINDOW = 8  # a^8 = 0.017 — truncation error < 2% of a unit shock
# shared literal weights: (1-a) * a^j, identical text in both engines
EWMA_WEIGHTS = [(1.0 - EWMA_ALPHA) * EWMA_ALPHA**j for j in range(EWMA_WINDOW)]


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users active in the trailing ROLLING_DAYS window, for
    every day observed in the data."""
    ev = load_table(spark, sf_dir, "events")
    day = exact_floor_div(event_time_seconds(ev, "ts"), 86400)
    user_days = ev.select("user_id", day.alias("day_idx")).distinct()
    observed = user_days.select("day_idx").distinct()
    # each user-day supports report days d .. d+6 (bounded fan-out)
    fanout = user_days.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day_idx"),
                F.col("day_idx") + F.lit(ROLLING_DAYS - 1),
            )
        ).alias("report_day"),
    ).distinct()
    return (
        fanout.join(observed, fanout.report_day == observed.day_idx)
        .groupBy("report_day")
        .agg(F.count(F.lit(1)).alias("active_users_7d"))
    )


def q_ewma_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-window EWMA of the hourly value sum per event type."""
    ev = load_table(spark, sf_dir, "events")
    hour = exact_floor_div(event_time_seconds(ev, "ts"), 3600)
    hourly = (
        ev.groupBy("event_type", hour.alias("hour_idx"))
        # decimal-exact hourly sum: order-independent across partials
        .agg(F.sum(F.col("value").cast("decimal(28,6)")).alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("hour_idx")
    # fixed left-to-right addition order, mirrored in the oracle
    terms = [
        F.coalesce(F.lag(F.col("x").cast("double"), j).over(w), F.lit(0.0))
        * F.lit(EWMA_WEIGHTS[j])
        for j in range(EWMA_WINDOW)
    ]
    ewma = terms[0]
    for t in terms[1:]:
        ewma = ewma + t
    return hourly.select(
        "event_type",
        "hour_idx",
        F.round(F.col("x").cast("double"), 6).alias("hourly_value"),
        F.round(ewma, 6).alias("ewma_value"),
    )


def q_chi2_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for independence of event_type and
    hour-of-day, plus degrees of freedom and cell count."""
    ev = load_table(spark, sf_dir, "events")
    hod = F.pmod(exact_floor_div(event_time_seconds(ev, "ts"), 3600), 24)
    cells = ev.groupBy("event_type", hod.alias("hod")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = Window.partitionBy()
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("hod")
    with_marg = cells.select(
        "event_type",
        "hod",
        "n",
        F.sum("n").over(w_row).alias("row_tot"),
        F.sum("n").over(w_col).alias("col_tot"),
        F.sum("n").over(w_all).alias("grand"),
    )
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("grand").cast("double")
    )
    diff = F.col("n").cast("double") - expected
    contrib = (diff * diff / expected).cast("decimal(28,6)")
    n_types = F.countDistinct("event_type")
    n_hods = F.countDistinct("hod")
    return with_marg.agg(
        F.round(F.sum(contrib).cast("double"), 4).alias("chi2"),
        ((n_types - 1) * (n_hods - 1)).cast("bigint").alias("dof"),
        F.count(F.lit(1)).alias("n_cells"),
    )


def q_daily_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, day) — the attribution anchor marketing
    pipelines key on ("first touch of the session/day"). One window
    partitioned by (user_id, day): high-cardinality, low-skew keys,
    bounded rows per partition; event_id tiebreaks same-second
    events deterministically."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        exact_floor_div(event_time_seconds(ev, "ts"), 86400).alias("day_idx"),
        "event_type",
        "event_id",
        event_time_seconds(ev, "ts").alias("ts_s"),
    )
    w = Window.partitionBy("user_id", "day_idx").orderBy("ts_s", "event_id")
    return (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "day_idx",
            F.col("event_type").alias("first_touch_type"),
            F.col("ts_s").alias("first_ts_s"),
        )
    )


def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: open/high/low/close of ``value`` per
    (event_type, hour) — the hypertable/metrics-rollup primitive
    (TimescaleDB's time_bucket + first/last, public).

    Scale shape: ONE hash aggregate, no window. Open/close are
    min_by/max_by on a packed (ts_s, event_id) decimal sort key —
    unique because event_id is, so the result is deterministic and
    order-independent; a window row_number would sort every
    (type, hour) partition instead. decimal(38,0) packing never
    overflows (ts_s ~ 2e9 -> key ~ 2e22) and stays exact where a
    double key would round event_id through a 53-bit mantissa."""
    ev = load_table(spark, sf_dir, "events")
    ts_s = event_time_seconds(ev, "ts")
    base = ev.select(
        "event_type",
        exact_floor_div(ts_s, 3600).alias("hour_idx"),
        "value",
        # pack (ts_s, event_id) into one orderable exact key
        (
            ts_s.cast("decimal(38,0)") * F.lit(10_000_000_000_000).cast("decimal(38,0)")
            + F.col("event_id").cast("decimal(38,0)")
        ).alias("ord_key"),
    )
    return base.groupBy("event_type", "hour_idx").agg(
        F.round(F.min_by("value", "ord_key"), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", "ord_key"), 6).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


ACF_MAX_LAG = 6


def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the global hourly event-count series at lags
    1..ACF_MAX_LAG — the stationarity/seasonality probe run before any
    forecasting model is trusted (Box & Jenkins, public).

    r_k = sum_t (x_t - mean)(x_{t+k} - mean) / sum_t (x_t - mean)^2,
    the standard biased estimator (denominator over ALL n terms).

    Scale shape: the heavy work (events -> hourly counts) is one
    keyed hash-agg; the window runs over the HOURLY series, whose
    length is bounded by the time range (720 rows for a month), not
    the event volume — a single-partition sort of a tiny frame. All
    lag products are decimal-cast per-term so the sums are
    order-independent; mean is a ratio of exact integers."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        exact_floor_div(event_time_seconds(ev, "ts"), 3600).alias("hour_idx")
    ).agg(F.count(F.lit(1)).alias("x"))
    stats = hourly.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")).alias("mean"),
    )
    w = Window.orderBy("hour_idx")
    lagged = hourly.crossJoin(F.broadcast(stats)).select(
        (F.col("x").cast("double") - F.col("mean")).alias("dev"),
        *[
            (F.lag(F.col("x").cast("double"), j).over(w) - F.col("mean")).alias(
                f"dev_{j}"
            )
            for j in range(1, ACF_MAX_LAG + 1)
        ],
    )
    agg = lagged.agg(
        F.sum((F.col("dev") * F.col("dev")).cast("decimal(28,6)")).alias("den"),
        F.count(F.lit(1)).alias("n_hours"),
        *[
            F.sum((F.col("dev") * F.col(f"dev_{j}")).cast("decimal(28,6)")).alias(
                f"num_{j}"
            )
            for j in range(1, ACF_MAX_LAG + 1)
        ],
    )
    pairs = ", ".join(
        f"{j}L, round(cast(num_{j} as double) / cast(den as double), 6)"
        for j in range(1, ACF_MAX_LAG + 1)
    )
    return agg.select(
        F.expr(f"stack({ACF_MAX_LAG}, {pairs})").alias("lag", "acf"),
        "n_hours",
    )


SEASON_HOURS = 168  # hour-of-week seasonality


def q_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy audit of the hour-of-week seasonal-naive
    predictor (x_t ~ x_{t-168}) on the per-type hourly value series:
    MASE (Hyndman & Koehler 2006, public) and sMAPE per event_type.

    MASE = MAE(seasonal naive) / MAE(one-step naive): < 1 means the
    seasonal pattern beats persistence. Both forecasts are expressed
    as EQUI-JOINS on (event_type, hour_idx - k), not window lag(k) —
    lag(k) counts observed ROWS, which silently misaligns across
    gaps, while the join only pairs true calendar-distance hours and
    drops gap hours; it also stays a keyed shuffle at scale instead
    of a per-type sort. Hourly sums and absolute errors are
    decimal(28,6)-exact; only the final ratios are doubles. sMAPE
    per-term contributions (bounded [0,2]) are decimal-cast so the
    mean is order-independent."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        exact_floor_div(event_time_seconds(ev, "ts"), 3600).alias("hour_idx"),
    ).agg(F.sum(F.col("value").cast("decimal(28,6)")).alias("x"))

    cur = hourly.alias("cur")
    season = hourly.select(
        "event_type", (F.col("hour_idx") + SEASON_HOURS).alias("hour_idx"),
        F.col("x").alias("x_season"),
    ).alias("season")
    prev = hourly.select(
        "event_type", (F.col("hour_idx") + 1).alias("hour_idx"),
        F.col("x").alias("x_prev"),
    ).alias("prev")

    seas_err = (
        cur.join(season, ["event_type", "hour_idx"])
        .select(
            "event_type",
            F.abs(F.col("x") - F.col("x_season")).alias("abs_err"),
            (
                F.lit(2.0)
                * F.abs(F.col("x") - F.col("x_season")).cast("double")
                / (F.abs(F.col("x")) + F.abs(F.col("x_season"))).cast("double")
            ).cast("decimal(28,6)").alias("smape_term"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("abs_err").alias("sum_abs_err"),
            F.sum("smape_term").alias("sum_smape"),
            F.count(F.lit(1)).alias("n_eval"),
        )
    )
    naive_err = (
        cur.join(prev, ["event_type", "hour_idx"])
        .select("event_type", F.abs(F.col("x") - F.col("x_prev")).alias("abs_n1"))
        .groupBy("event_type")
        .agg(F.sum("abs_n1").alias("sum_abs_n1"), F.count(F.lit(1)).alias("n_naive"))
    )
    return seas_err.join(naive_err, "event_type").select(
        "event_type",
        "n_eval",
        F.round(
            (F.col("sum_abs_err").cast("double") / F.col("n_eval").cast("double"))
            / (F.col("sum_abs_n1").cast("double") / F.col("n_naive").cast("double")),
            6,
        ).alias("mase"),
        F.round(F.col("sum_smape").cast("double") / F.col("n_eval").cast("double"), 6)
        .alias("smape"),
    )


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954, public) per event
    type: the hour where the cumulative deviation from the series
    mean peaks — the standard level-shift locator run before trusting
    any aggregate drift number.

    CUSUM_t = sum_{i<=t}(x_i - mean) has an exact integer form:
    N_t = n * prefix_t - t_rank * S (prefix sums and totals are
    bigint counts), with CUSUM_t = N_t / n. The argmax over |N_t| is
    therefore integer-exact — no float enters until the final
    released magnitude. Tie-break: earliest hour.

    Scale shape: one keyed count agg (the only pass over events),
    then windows over the per-type HOURLY frame (calendar-bounded
    partitions, the q_acf_lags argument); the argmax is one more
    bounded window."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        exact_floor_div(event_time_seconds(ev, "ts"), 3600).alias("hour_idx"),
    ).agg(F.count(F.lit(1)).alias("x"))
    w_ord = Window.partitionBy("event_type").orderBy("hour_idx")
    w_all = Window.partitionBy("event_type")
    scanned = hourly.select(
        "event_type",
        "hour_idx",
        F.sum("x").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "prefix"
        ),
        F.row_number().over(w_ord).alias("t_rank"),
        F.sum("x").over(w_all).alias("s_tot"),
        F.count(F.lit(1)).over(w_all).alias("n_hours"),
    ).select(
        "event_type",
        "hour_idx",
        "n_hours",
        (F.col("n_hours") * F.col("prefix") - F.col("t_rank") * F.col("s_tot"))
        .alias("n_t"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("n_t")).desc(), F.asc("hour_idx")
    )
    return (
        scanned.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour_idx").alias("cp_hour_idx"),
            "n_hours",
            F.round(
                F.col("n_t").cast("double") / F.col("n_hours").cast("double"), 6
            ).alias("cusum_at_cp"),
        )
    )


_SECS = "(epoch_us(ts) // 1000000)"

_FIRST_TOUCH_SQL = f"""
WITH base AS (
  SELECT user_id, {_SECS} // 86400 AS day_idx, event_type, event_id,
         {_SECS} AS ts_s
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, day_idx
                               ORDER BY ts_s, event_id) AS rn
  FROM base
)
SELECT user_id, day_idx, event_type AS first_touch_type, ts_s AS first_ts_s
FROM ranked WHERE rn = 1
"""

_ROLLING_SQL = f"""
WITH user_days AS (
  SELECT DISTINCT user_id, {_SECS} // 86400 AS day_idx FROM events
),
observed AS (SELECT DISTINCT day_idx FROM user_days),
fanout AS (
  SELECT DISTINCT user_id, day_idx + j AS report_day
  FROM user_days, (SELECT unnest(range(0, {ROLLING_DAYS})) AS j)
)
SELECT o.day_idx AS report_day, count(*)::BIGINT AS active_users_7d
FROM fanout f JOIN observed o ON f.report_day = o.day_idx
GROUP BY o.day_idx
"""

_EWMA_TERMS = " + ".join(
    f"coalesce(lag(CAST(x AS DOUBLE), {j}) OVER w, 0.0) * {w!r}"
    for j, w in enumerate(EWMA_WEIGHTS)
)
_EWMA_SQL = f"""
WITH hourly AS (
  SELECT event_type, {_SECS} // 3600 AS hour_idx,
         SUM(CAST(value AS DECIMAL(28,6))) AS x
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_idx,
       round(CAST(x AS DOUBLE), 6) AS hourly_value,
       round({_EWMA_TERMS}, 6) AS ewma_value
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx)
"""

_CHI2_SQL = f"""
WITH cells AS (
  SELECT event_type, ({_SECS} // 3600) % 24 AS hod, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
marg AS (
  SELECT event_type, hod, n,
         SUM(n) OVER (PARTITION BY event_type) AS row_tot,
         SUM(n) OVER (PARTITION BY hod) AS col_tot,
         SUM(n) OVER () AS grand
  FROM cells
)
SELECT round(CAST(SUM(CAST(
         (CAST(n AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
             / CAST(grand AS DOUBLE))
         * (CAST(n AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
             / CAST(grand AS DOUBLE))
         / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(grand AS DOUBLE))
       AS DECIMAL(28,6))) AS DOUBLE), 4) AS chi2,
       ((count(DISTINCT event_type) - 1) * (count(DISTINCT hod) - 1))::BIGINT AS dof,
       count(*)::BIGINT AS n_cells
FROM marg
"""

_OHLC_SQL = f"""
WITH base AS (
  SELECT event_type, {_SECS} // 3600 AS hour_idx, value,
         CAST({_SECS} AS HUGEINT) * 10000000000000 + event_id AS ord_key
  FROM events
)
SELECT event_type, hour_idx,
       round(arg_min(value, ord_key), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(arg_max(value, ord_key), 6) AS close,
       count(*)::BIGINT AS n_events
FROM base GROUP BY 1, 2
"""

_ACF_DEV_COLS = ",\n         ".join(
    f"lag(CAST(x AS DOUBLE), {j}) OVER w - mean AS dev_{j}"
    for j in range(1, ACF_MAX_LAG + 1)
)
_ACF_NUM_COLS = ",\n         ".join(
    f"SUM(CAST(dev * dev_{j} AS DECIMAL(28,6))) AS num_{j}"
    for j in range(1, ACF_MAX_LAG + 1)
)
_ACF_ROWS = "\nUNION ALL\n".join(
    f"SELECT {j}::BIGINT AS lag,"
    f" round(CAST(num_{j} AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf,"
    f" n_hours FROM agg"
    for j in range(1, ACF_MAX_LAG + 1)
)
_ACF_SQL = f"""
WITH hourly AS (
  SELECT {_SECS} // 3600 AS hour_idx, count(*)::BIGINT AS x
  FROM events GROUP BY 1
),
stats AS (
  SELECT CAST(SUM(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean FROM hourly
),
lagged AS (
  SELECT CAST(x AS DOUBLE) - mean AS dev,
         {_ACF_DEV_COLS}
  FROM hourly, stats
  WINDOW w AS (ORDER BY hour_idx)
),
agg AS (
  SELECT SUM(CAST(dev * dev AS DECIMAL(28,6))) AS den,
         count(*)::BIGINT AS n_hours,
         {_ACF_NUM_COLS}
  FROM lagged
)
{_ACF_ROWS}
"""

_MASE_SQL = f"""
WITH hourly AS (
  SELECT event_type, {_SECS} // 3600 AS hour_idx,
         SUM(CAST(value AS DECIMAL(28,6))) AS x
  FROM events GROUP BY 1, 2
),
seas AS (
  SELECT c.event_type,
         SUM(abs(c.x - s.x)) AS sum_abs_err,
         SUM(CAST(2.0 * CAST(abs(c.x - s.x) AS DOUBLE)
                  / CAST(abs(c.x) + abs(s.x) AS DOUBLE)
             AS DECIMAL(28,6))) AS sum_smape,
         count(*)::BIGINT AS n_eval
  FROM hourly c JOIN hourly s
    ON c.event_type = s.event_type AND c.hour_idx = s.hour_idx + {SEASON_HOURS}
  GROUP BY 1
),
naive AS (
  SELECT c.event_type,
         SUM(abs(c.x - p.x)) AS sum_abs_n1,
         count(*)::BIGINT AS n_naive
  FROM hourly c JOIN hourly p
    ON c.event_type = p.event_type AND c.hour_idx = p.hour_idx + 1
  GROUP BY 1
)
SELECT s.event_type, s.n_eval,
       round((CAST(sum_abs_err AS DOUBLE) / CAST(n_eval AS DOUBLE))
             / (CAST(sum_abs_n1 AS DOUBLE) / CAST(n_naive AS DOUBLE)), 6) AS mase,
       round(CAST(sum_smape AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS smape
FROM seas s JOIN naive n ON s.event_type = n.event_type
"""

_CUSUM_SQL = f"""
WITH hourly AS (
  SELECT event_type, {_SECS} // 3600 AS hour_idx, count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2
),
scanned AS (
  SELECT event_type, hour_idx,
         SUM(x) OVER (PARTITION BY event_type ORDER BY hour_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
         row_number() OVER (PARTITION BY event_type ORDER BY hour_idx) AS t_rank,
         SUM(x) OVER (PARTITION BY event_type) AS s_tot,
         count(*) OVER (PARTITION BY event_type) AS n_hours
  FROM hourly
),
stat AS (
  SELECT event_type, hour_idx, n_hours,
         n_hours * prefix - t_rank * s_tot AS n_t
  FROM scanned
),
picked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY abs(n_t) DESC, hour_idx ASC) AS rn
  FROM stat
)
SELECT event_type, hour_idx AS cp_hour_idx, CAST(n_hours AS BIGINT) AS n_hours,
       round(CAST(n_t AS DOUBLE) / CAST(n_hours AS DOUBLE), 6) AS cusum_at_cp
FROM picked WHERE rn = 1
"""



# ------------------------------------------------- Holt linear trend

HOLT_ALPHA = 0.5  # level smoothing
HOLT_BETA = 0.3  # trend smoothing
_HOLT_1MA = 1.0 - HOLT_ALPHA  # baked complements: the two engines
_HOLT_1MB = 1.0 - HOLT_BETA  # must fold the SAME doubles, and
# 1.0 - 0.3 is NOT the same double as a literal 0.7
HOLT_HORIZONS = (1, 2, 3)


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over the global
    hourly value series, with 1/2/3-hour-ahead forecasts and the
    in-sample one-step MAE.

    The EWMA query above truncates its recursion into a fixed lag
    window (fine for a level-only smoother); Holt's trend recursion
    has no such finite expansion, so this query embraces the
    sequential fold — which is safe exactly because the series is
    DOMAIN-bounded: hours in the corpus time span (720 for a 30-day
    corpus; ~9k for a year), never row count. Shape: one keyed
    hourly aggregate (integer cents — order-independent partials),
    collect the <= |hours| points into a sorted array in a 1-row
    frame, and fold once with `aggregate()`. The DuckDB twin runs
    the IDENTICAL recursion as a recursive CTE: same literals, same
    expression shapes, so every intermediate double matches and the
    outputs hash-check without tolerance.

    Init (standard): l_1 = y_1, b_1 = y_2 - y_1; recursion from t=2:
    l_t = a*y_t + (1-a)*(l+b); b_t = g*(l_t - l) + (1-g)*b. Output
    is in dollars (cents / 100 at the very end)."""
    ev = load_table(spark, sf_dir, "events")
    hour = exact_floor_div(event_time_seconds(ev, "ts"), 3600)
    cents = F.coalesce(F.round(F.col("value") * 100).cast("bigint"), F.lit(0))
    hourly = ev.groupBy(hour.alias("h")).agg(F.sum(cents).alias("c"))
    arr = hourly.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("h"), F.col("c").cast("double").alias("y"))
            )
        ).alias("a")
    )
    a = F.col("a")
    al, one_ma = F.lit(HOLT_ALPHA), F.lit(_HOLT_1MA)
    be, one_mb = F.lit(HOLT_BETA), F.lit(_HOLT_1MB)
    init = F.struct(
        F.element_at(a, 1)["y"].alias("l"),
        (F.element_at(a, 2)["y"] - F.element_at(a, 1)["y"]).alias("b"),
        F.lit(0.0).alias("sae"),
    )

    def step(acc, x):
        pred = acc["l"] + acc["b"]
        l2 = al * x["y"] + one_ma * pred
        b2 = be * (l2 - acc["l"]) + one_mb * acc["b"]
        return F.struct(
            l2.alias("l"),
            b2.alias("b"),
            (acc["sae"] + F.abs(x["y"] - pred)).alias("sae"),
        )

    folded = F.aggregate(F.slice(a, 2, F.size(a) - 1), init, step)
    n = F.size(a).cast("bigint")
    out = [
        n.alias("n_hours"),
        F.round(folded["l"] / F.lit(100.0), 6).alias("level"),
        F.round(folded["b"] / F.lit(100.0), 6).alias("trend"),
        F.round(
            folded["sae"] / (n - 1).cast("double") / F.lit(100.0), 6
        ).alias("one_step_mae"),
    ]
    for h in HOLT_HORIZONS:
        out.append(
            F.round(
                (folded["l"] + F.lit(float(h)) * folded["b"]) / F.lit(100.0), 6
            ).alias(f"fc_{h}h")
        )
    return arr.select(*out)


_L2 = f"{HOLT_ALPHA!r} * s.y + {_HOLT_1MA!r} * (r.l + r.b)"
_HOLT_SQL = f"""
WITH RECURSIVE hourly AS (
  SELECT epoch_us(ts) // 1000000 // 3600 AS h,
         CAST(SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT)
           AS c
  FROM events GROUP BY 1
), s AS (
  SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS idx,
         CAST(c AS DOUBLE) AS y
  FROM hourly
), nn AS (
  SELECT CAST(max(idx) AS BIGINT) AS n FROM s
), r AS (
  SELECT CAST(2 AS BIGINT) AS i,
         (SELECT y FROM s WHERE idx = 1) AS l,
         (SELECT y FROM s WHERE idx = 2) - (SELECT y FROM s WHERE idx = 1)
           AS b,
         CAST(0.0 AS DOUBLE) AS sae
  UNION ALL
  SELECT r.i + 1,
         {_L2},
         {HOLT_BETA!r} * (({_L2}) - r.l) + {_HOLT_1MB!r} * r.b,
         r.sae + abs(s.y - (r.l + r.b))
  FROM r JOIN s ON s.idx = r.i
)
SELECT nn.n AS n_hours,
       round(r.l / 100.0, 6) AS level,
       round(r.b / 100.0, 6) AS trend,
       round(r.sae / CAST(nn.n - 1 AS DOUBLE) / 100.0, 6) AS one_step_mae,
       {", ".join(
           f"round((r.l + {float(h)!r} * r.b) / 100.0, 6) AS fc_{h}h"
           for h in HOLT_HORIZONS
       )}
FROM r, nn
WHERE r.i = nn.n + 1
"""

QUERIES = {
    "events_holt_forecast": q_holt_forecast,
    "events_cusum_changepoint": q_cusum_changepoint,
    "events_rolling_7d_active_users": q_rolling_active_users,
    "events_ewma_hourly_value": q_ewma_hourly_value,
    "events_chi2_type_hour": q_chi2_type_hour,
    "events_daily_first_touch": q_daily_first_touch,
    "events_ohlc_hourly": q_ohlc_hourly,
    "events_acf_lags": q_acf_lags,
    "events_seasonal_naive_mase": q_seasonal_naive_mase,
}
ORACLES = {
    "events_holt_forecast": _HOLT_SQL,
    "events_cusum_changepoint": _CUSUM_SQL,
    "events_rolling_7d_active_users": _ROLLING_SQL,
    "events_ewma_hourly_value": _EWMA_SQL,
    "events_chi2_type_hour": _CHI2_SQL,
    "events_daily_first_touch": _FIRST_TOUCH_SQL,
    "events_ohlc_hourly": _OHLC_SQL,
    "events_acf_lags": _ACF_SQL,
    "events_seasonal_naive_mase": _MASE_SQL,
}
