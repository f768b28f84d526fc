"""Event-stream analytics (batch form) — tumbling windows, running
totals, sessionization.

The same logical queries run under Structured Streaming in
searchengine_spark.streaming.events; here they are expressed in batch
form with DuckDB oracle twins. Aggregated doubles go through DECIMAL
casts so parallel summation is order-independent (see tpch.py).

Scale notes:
- hourly rollup: shuffle keyed (window, event_type) — bounded key
  space, trivially parallel.
- running totals / sessions: one shuffle on user_id; within a user,
  window functions sort locally. user_id is the natural partition key
  at 100 TB (high cardinality, low skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_seconds, exact_floor_div
from searchengine_spark.io import load_table

SESSION_GAP_MIN = 30


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative spend ordered by time (analytic window)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("bigint").alias("seq"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via lag + cumulative flag sum.

    The classic batch sessionize: new_session = gap > threshold;
    session_id = running count of new_session flags per user.
    """
    ev = load_table(spark, sf_dir, "events")
    ts_s = event_time_seconds(ev, "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        (ts_s - F.lag(ts_s, 1, None).over(w) > SESSION_GAP_MIN * 60).cast("int"),
    ).withColumn(
        "session_id",
        F.sum(F.coalesce(F.col("new_session"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_s) - F.min(ts_s)).alias("session_seconds"),
        F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("session_value"),
    )


def q_events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global per-type profile incl. a JSON-extracted property."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum("k").alias("sum_k"),
        F.countDistinct("user_id").alias("n_users"),
    )


_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN (epoch_us(ts) // 1000000) - LAG((epoch_us(ts) // 1000000)) OVER w > {SESSION_GAP_MIN * 60}
              THEN 1
              WHEN LAG((epoch_us(ts) // 1000000)) OVER w IS NULL THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       (max(epoch_us(ts) // 1000000) - min(epoch_us(ts) // 1000000)) AS session_seconds,
       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS session_value
FROM sessioned
GROUP BY user_id, session_id
"""

def q_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding window frame: 5-event moving average per user
    (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) — the frame variant
    the running-total query (unbounded frame) doesn't cover. Exact
    decimal sum over the frame / frame row count, so both engines
    agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(28,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    ).withColumn("moving_avg", F.round("moving_avg", 6))


def q_events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag surface: seconds since the user's previous event and
    until the next one (NULL at partition edges)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = event_time_seconds(ev, "ts")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (ts_s - F.lag(ts_s, 1).over(w)).alias("secs_since_prev"),
        (F.lead(ts_s, 1).over(w) - ts_s).alias("secs_until_next"),
    )


def q_events_props_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: parse the props JSON into map<string,bigint>
    and explode to (event_id, key, val) rows — the schema-on-read
    path for semi-structured event properties (generic over whatever
    keys appear; no per-key schema migration)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "val"),
    )


RANGE_FRAME_SECONDS = 600


def q_events_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, vs the row-count frame of
    events_moving_avg): per user, total spend in the trailing 10
    MINUTES of event time — peers are selected by timestamp
    distance, so a burst of events contributes regardless of row
    count. Spark range frames need a numeric sort key: order by
    epoch seconds and bound by +/-seconds."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(event_time_seconds(ev, "ts"))
        .rangeBetween(-RANGE_FRAME_SECONDS, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_10m_value"),
        F.count(F.lit(1)).over(w).alias("trailing_10m_events"),
    )


def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path for semi-structured data: parse the
    props JSON ONCE into a variant (binary, typed-on-read) and do
    typed extraction — at scale this beats per-access get_json_object
    re-parsing, and the variant column is storable/shreddable."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    return v.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_big_k"),
    )


def q_events_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window in BATCH mode (same operator the
    streaming path uses) — cross-checked against the portable
    lag+cumsum SQL formulation, pinning down the boundary semantics:
    an event exactly `gap` after the previous one starts a NEW
    session (windows are [start, last_ts + gap))."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def q_events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal regularization: per user, an hourly grid spanning the
    user's [first, last] active hour, with that hour's summed value
    (0 where absent) and a forward-filled last-observed value — the
    resample/ffill step feature pipelines need before windowed model
    features.

    Scale shape: hour buckets are INTEGER epoch-hour indexes (exact,
    flavor-agnostic); the grid explodes map-side from one (user, span)
    row each, the join is keyed (user_id, hour) — uniform, and the
    ffill window partitions by user. No global ordering anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    h = event_time_seconds(ev, "ts")  # exact epoch seconds
    hourly = ev.groupBy(
        "user_id", exact_floor_div(h, 3600).alias("hour_idx")
    ).agg(
        F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("v")
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1")
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour_idx")
    )
    joined = grid.join(hourly, ["user_id", "hour_idx"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_idx",
        F.coalesce(F.col("v"), F.lit(0.0)).alias("hour_value"),
        F.last("v", ignorenulls=True).over(w).alias("ffill_value"),
    )


def q_events_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct users, in the scalable shape: distinct-count
    windows don't exist, and a global per-event cumulative would force
    a single-task window. Instead: first-seen day per user (keyed
    agg), new users per day, then the cumulative over DAY-grain rows
    — the unpartitioned window touches only ~tens of rows at any
    corpus size."""
    ev = load_table(spark, sf_dir, "events")
    day = exact_floor_div(event_time_seconds(ev, "ts"), 86400)
    first_day = ev.groupBy("user_id").agg(F.min(day).alias("day_idx"))
    per_day = first_day.groupBy("day_idx").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        "day_idx", "new_users", F.sum("new_users").over(w).alias("cumulative_users")
    )


def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day
    (cohort), counted distinct-active per days-since-cohort offset —
    the standard product-analytics triangle.

    Scale shape: (user, day) distinct is one shuffle on user_id+day;
    cohort assignment is a keyed agg + equi join on user_id; the
    final agg keys on the tiny (cohort_day, days_since) domain.
    """
    ev = load_table(spark, sf_dir, "events")
    day = exact_floor_div(event_time_seconds(ev, "ts"), 86400)
    user_days = ev.select("user_id", day.alias("day_idx")).distinct()
    cohorts = user_days.groupBy("user_id").agg(F.min("day_idx").alias("cohort_day"))
    return (
        user_days.join(cohorts, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day_idx") - F.col("cohort_day")).alias("days_since"),
        )
        # plain count: user_days is distinct on (user_id, day_idx) and
        # day_idx is fixed within a group, so each user appears once —
        # countDistinct would add an Expand + dedup pass for nothing.
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


FUNNEL_STEPS = ("signup", "click", "purchase")
FUNNEL_WINDOW_S = 86400  # each step must convert within 24h of the prior


def _funnel_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, t1, t2, t3) per signed-up user: earliest qualifying
    completion time of each funnel prefix (NULL where the window was
    missed). Shared by the funnel counts and the latency quantiles."""
    ev = load_table(spark, sf_dir, "events")
    ts_s = event_time_seconds(ev, "ts")
    s1, s2, s3 = FUNNEL_STEPS
    w = FUNNEL_WINDOW_S
    base = ev.select("user_id", "event_type", ts_s.alias("ts_s"))
    # t1 is the DRIVING table: every user who signed up counts toward
    # n_signup, including users with no later-step events at all —
    # inner-joining through step-2/3 events would silently drop them.
    t1 = base.filter(F.col("event_type") == s1).groupBy("user_id").agg(
        F.min("ts_s").alias("t1")
    )
    in_w = lambda t0: (F.col("ts_s") >= F.col(t0)) & (F.col("ts_s") <= F.col(t0) + w)
    t2 = (
        base.filter(F.col("event_type") == s2)
        .join(t1, "user_id")
        .filter(in_w("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t2"))
    )
    t12 = t1.join(t2, "user_id", "left")
    t3 = (
        base.filter(F.col("event_type") == s3)
        .join(t12.filter(F.col("t2").isNotNull()).select("user_id", "t2"), "user_id")
        .filter(in_w("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t3"))
    )
    return t12.join(t3, "user_id", "left")


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed ordered funnel: users completing each prefix of
    signup -> click -> purchase, where each step must occur within
    FUNNEL_WINDOW_S seconds at-or-after the user's completion of the
    previous step (earliest qualifying event — strict conversion-
    window funnel semantics).

    Scale shape: one conditional-min agg per user per step, computed
    in TWO keyed aggregations with an equi self-join on user_id in
    between — no windows over the raw stream, no event explosion.
    """
    s1, s2, s3 = FUNNEL_STEPS
    return _funnel_per_user(spark, sf_dir).agg(
        F.count(F.lit(1)).alias(f"n_{s1}"),
        F.count("t2").alias(f"n_{s1}_{s2}"),
        F.count("t3").alias(f"n_{s1}_{s2}_{s3}"),
    )


def q_events_funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: quantiles of (first qualifying
    purchase - signup) seconds over funnel completers. One more tiny
    agg over the funnel's per-user frame — no new stream passes;
    exact percentiles over |completers| values (at true scale, swap
    for approx_percentile / a t-digest; same topology)."""
    lat = (
        _funnel_per_user(spark, sf_dir)
        .filter(F.col("t3").isNotNull())
        .select((F.col("t3") - F.col("t1")).cast("double").alias("lat_s"))
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("lat_s", F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile("lat_s", F.lit(0.9)), 6).alias("p90_s"),
        F.round(F.percentile("lat_s", F.lit(0.99)), 6).alias("p99_s"),
    )


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence/path analysis: first-order transition matrix over
    each user's time-ordered event stream — count and probability of
    event type B immediately following A.

    Scale shape: one user-partitioned lead window (the same shuffle
    every per-user analytic here pays), then a keyed agg onto the
    tiny (from_type, to_type) domain; the row-probability window
    partitions that 5x5 result, not the stream.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type", 1).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    row_total = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row_total), 6).alias("p"),
    )


ANOMALY_HISTORY = 20   # trailing events per user forming the baseline
ANOMALY_MIN_N = 5      # minimum history before a z-score is meaningful
ANOMALY_Z = 3.0


def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection in batch: flag events whose
    value deviates > ANOMALY_Z sample standard deviations from the
    user's TRAILING window (the previous ANOMALY_HISTORY events,
    excluding the current one — no self-contamination).

    Determinism: values are lifted to integer cents
    (floor(v*100+0.5)), so the windowed sum and sum-of-squares are
    exact bigints; mean/variance/z are then IEEE double images of
    exact integers — identical in every engine, no float-accumulation
    order dependence. Zero-variance history yields no z (NULL guard),
    and users with < ANOMALY_MIN_N prior events are skipped.

    Scale: one window keyed on user_id (high cardinality, low skew);
    state per key is the O(ANOMALY_HISTORY) frame. The same trailing
    statistic runs incrementally in Structured Streaming via
    applyInPandasWithState (streaming/stateful.py shape).
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOMALY_HISTORY, -1)
    )
    stats = ev.withColumn("c", cents).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "c",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("s2"),
    )
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    z = (F.col("c") - F.col("s").cast("double") / F.col("n")) / F.sqrt(var)
    return (
        stats.filter(F.col("n") >= ANOMALY_MIN_N)
        .withColumn("z", F.when(var > 0, F.round(z, 6)))
        .filter(F.abs(F.col("z")) >= ANOMALY_Z)
        .select("event_id", "user_id", "event_type", "value", "z")
    )


_FUNNEL_LATENCY_SQL = """
WITH base AS (
  SELECT user_id, event_type, (epoch_us(ts) // 1000000) AS ts_s FROM events
),
t1 AS (
  SELECT user_id, MIN(ts_s) AS t1 FROM base
  WHERE event_type = 'signup' GROUP BY user_id
),
t2 AS (
  SELECT b.user_id, MIN(b.ts_s) AS t2
  FROM base b JOIN t1 ON b.user_id = t1.user_id
  WHERE b.event_type = 'click'
    AND b.ts_s >= t1.t1 AND b.ts_s <= t1.t1 + 86400
  GROUP BY b.user_id
),
t3 AS (
  SELECT b.user_id, MIN(b.ts_s) AS t3
  FROM base b JOIN t2 ON b.user_id = t2.user_id
  WHERE b.event_type = 'purchase'
    AND b.ts_s >= t2.t2 AND b.ts_s <= t2.t2 + 86400
  GROUP BY b.user_id
),
lat AS (
  SELECT CAST(t3.t3 - t1.t1 AS DOUBLE) AS lat_s
  FROM t3 JOIN t1 ON t3.user_id = t1.user_id
)
SELECT count(*)::BIGINT AS n_converted,
       round(quantile_cont(lat_s, 0.5), 6) AS p50_s,
       round(quantile_cont(lat_s, 0.9), 6) AS p90_s,
       round(quantile_cont(lat_s, 0.99), 6) AS p99_s
FROM lat
"""

def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the product-analytics ratio that
    rolling-7d actives doesn't give (MAU is one global distinct, not
    a per-day window). Two keyed aggregates: per-day distinct users
    (uniform day keys) and one corpus-wide distinct broadcast back as
    a 1-row frame; the ratio rounds to 6 on both engines."""
    ev = load_table(spark, sf_dir, "events")
    dau = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_start")
    ).agg(F.countDistinct("user_id").alias("dau"))
    mau = ev.agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.crossJoin(F.broadcast(mau))
        .select(
            "day_start",
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("day_start")
    )


def q_events_weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap by (weekday, hour) — the load-profile table
    behind capacity planning and anomaly baselines. Day-of-week comes
    from pure epoch-integer arithmetic ((days+3) % 7, 0 = Monday)
    instead of engine calendar functions, because Spark's dayofweek
    (1=Sunday) and DuckDB's dayofweek (0=Sunday) disagree — the
    integer form is identical everywhere and stays in whole-stage
    codegen. One keyed agg over a bounded 7x24 key space."""
    ev = load_table(spark, sf_dir, "events")
    secs = event_time_seconds(ev, "ts")
    days = exact_floor_div(secs, 86400)
    return (
        ev.select(
            ((days + 3) % 7).alias("dow"),
            exact_floor_div(secs % 86400, 3600).alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("dow", "hour")
    )


WM_JITTER_S = 3600  # simulated network delay: md5 jitter in [0, 1h)
WM_JITTER_SALT = "arrjit"
WM_CANDIDATES = (300, 1800, 7200)  # watermarks under audit
# Two-level running-max bucket SIZING RULE: the arrival-time bucket
# width is derived from VOLUME, not wall-clock — a fixed 1h bucket
# puts an hour of global traffic in one window partition at real
# event rates. n_buckets = clamp(ceil(n / WM_TARGET_BUCKET_ROWS), 1,
# WM_MAX_BUCKETS), width = ceil(arrival_span / n_buckets): average
# rows per within-bucket window stays ~max(TARGET, n / MAX_BUCKETS)
# (task-sized at any n; ~1e6 rows/bucket at 1e12 events), and the
# bucket-frame cumulative window stays <= WM_MAX_BUCKETS rows.
# Arrival-skewed streams (flash traffic) can still overload one
# bucket — sub-bucket by a second-level key if profiled (same trick).
WM_TARGET_BUCKET_ROWS = 1 << 16
WM_MAX_BUCKETS = 1 << 20


def q_events_watermark_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing what-if: under a deterministic hash-jitter
    arrival model (each event delayed md5(event_id) mod 1h), how many
    events would a `withWatermark(W)` drop, for candidate Ws? This is
    the batch simulation practitioners run before picking a watermark
    — the drop-rate-vs-state-size tradeoff made measurable. An event
    drops iff its event time is more than W behind the running MAX
    event time in arrival order (Spark's watermark rule, inclusive
    max is equivalent: a row that sets the max is never late).

    Scale shape: the arrival-order running max is the packed_windows
    two-level pattern — per-arrival-range bucket maxima, a bounded
    cumulative window over the bucket frame broadcast back, and a
    within-bucket running max — so no global-order window ever sees
    the full stream. The bucket width is sized FROM VOLUME (one 1-row
    count/min/max fold; see WM_TARGET_BUCKET_ROWS for the rule), so
    per-bucket rows stay task-sized at any event rate — a fixed
    wall-clock bucket would put an hour of global traffic in one
    window partition. Bucketing affects only the physical split: the
    two-level max equals the naive global running max for ANY width
    (pinned by test), and the oracle states the global window. The
    verdict fold is one conditional aggregate stacked to
    |WM_CANDIDATES| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    return watermark_drop_frame(ev)


def watermark_drop_frame(
    ev: DataFrame,
    *,
    target_bucket_rows: int = WM_TARGET_BUCKET_ROWS,
    max_buckets: int = WM_MAX_BUCKETS,
) -> DataFrame:
    """Core of q_events_watermark_sizing with the volume-sizing knobs
    exposed: ``target_bucket_rows`` caps the average rows per
    within-bucket window (tests shrink it to force a genuinely
    multi-bucket split on small fixtures); results are identical for
    ANY sizing — bucketing is purely the physical split."""
    s = event_time_seconds(ev, "ts")
    jit = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(WM_JITTER_SALT), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(WM_JITTER_S),
    )
    raw = ev.select("event_id", s.alias("s"), (s + jit).alias("arr"))
    sizing = raw.agg(
        F.count(F.lit(1)).alias("_wn"),
        F.min("arr").alias("_wa0"),
        F.max("arr").alias("_wa1"),
    )
    base = (
        raw.crossJoin(F.broadcast(sizing))
        .withColumn(
            "_wnb",
            F.expr(
                f"least(greatest((_wn + {target_bucket_rows - 1})"
                f" div {target_bucket_rows}, 1), {max_buckets})"
            ),
        )
        .withColumn(
            "_ww", F.expr("greatest((_wa1 - _wa0 + _wnb) div _wnb, 1)")
        )
        .withColumn("b", F.expr("(arr - _wa0) div _ww"))
        .drop("_wn", "_wa0", "_wa1", "_wnb", "_ww")
    )
    per_b = base.groupBy("b").agg(F.max("s").alias("bmax"))
    bw = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    prev = per_b.select(
        "b", F.max("bmax").over(bw).alias("prev_max")
    )
    ww = Window.partitionBy("b").orderBy("arr", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tracked = (
        base.join(F.broadcast(prev), "b")
        .withColumn("wmax", F.max("s").over(ww))
        .withColumn(
            "runmax",
            F.greatest(F.coalesce(F.col("prev_max"), F.col("wmax")), F.col("wmax")),
        )
    )
    agg = tracked.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                (F.col("s") < F.col("runmax") - F.lit(w)).cast("long")
            ).alias(f"_d{w}")
            for w in WM_CANDIDATES
        ],
    )
    stack_args = ", ".join(
        f"CAST({w} AS BIGINT), _d{w}" for w in WM_CANDIDATES
    )
    rows = agg.selectExpr(
        "_n", f"stack({len(WM_CANDIDATES)}, {stack_args}) AS (watermark_s, n_dropped)"
    )
    return rows.select(
        "watermark_s",
        F.col("_n").cast("bigint").alias("n_events"),
        F.col("n_dropped").cast("bigint").alias("n_dropped"),
        F.round(F.col("n_dropped") / F.col("_n"), 6).alias("frac_dropped"),
    ).orderBy("watermark_s")


_WM_DROP_SQL = ", ".join(
    f"""CAST(SUM(CASE WHEN s < runmax - {w} THEN 1 ELSE 0 END) AS BIGINT)
        AS d{w}"""
    for w in WM_CANDIDATES
)
_WM_ROWS_SQL = " UNION ALL ".join(
    f"SELECT CAST({w} AS BIGINT) AS watermark_s, n AS n_events,"
    f" d{w} AS n_dropped,"
    f" round(CAST(d{w} AS DOUBLE) / n, 6) AS frac_dropped FROM agg"
    for w in WM_CANDIDATES
)

_WM_SQL = f"""
WITH base AS (
  SELECT event_id,
         (epoch_us(ts) // 1000000) AS s,
         (epoch_us(ts) // 1000000)
           + (('0x' || substr(md5('{WM_JITTER_SALT}'
              || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % {WM_JITTER_S})
           AS arr
  FROM events
),
tracked AS (
  SELECT s,
         MAX(s) OVER (ORDER BY arr, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS runmax
  FROM base
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, {_WM_DROP_SQL}
  FROM tracked
)
{_WM_ROWS_SQL}
ORDER BY watermark_s
"""


CUPED_SALT = "cuped"


def q_events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for A/B readouts (Deng et al., WSDM
    2013): adjust each user's experiment-period metric Y by their
    PRE-period value X — Y_cuped = Y - θ(X - E[X]), θ = cov(X,Y)/
    var(X) — cutting metric variance without biasing the treatment
    difference. Assignment is the repo's derandomized md5 coin
    (user_id -> A/B), the period split is the corpus time midpoint,
    and the metric is per-user summed value in CENTS — integer
    accumulators end-to-end, so every covariance/variance input is an
    exact bigint in both engines and the only float ops are the final
    identical scalar expressions.

    Per variant: user count, raw and CUPED-adjusted mean (back in
    value units), and the variance ratio var(Y_cuped)/var(Y) — the
    number CUPED exists to shrink (var(Y-θX) = var_y - 2θcov + θ²
    var_x, all from the same integer sums).

    Scale shape: one scan -> per-user conditional sums (keyed on the
    uniform user_id) -> a 2-row variant aggregate + a 1-row global
    aggregate folded by broadcast crossJoin. Production note: at
    1e9+ users move the Σxy/Σx² accumulators to decimal(38,0) — the
    fixture's cents sums stay far below 2^63, but the headroom
    argument is per-corpus.
    """
    from searchengine_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    secs = event_time_seconds(ev, "ts")
    rng = ev.select(secs.alias("s")).agg(
        F.min("s").alias("_mn"), F.max("s").alias("_mx")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = (
        ev.select(
            "user_id",
            secs.alias("s"),
            F.coalesce(cents, F.lit(0)).alias("c"),
        )
        .crossJoin(F.broadcast(rng))
        .withColumn(
            "_mid", exact_floor_div(F.col("_mn") + F.col("_mx"), 2)
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("s") < F.col("_mid"), F.col("c")).otherwise(0))
            .alias("x"),
            F.sum(F.when(F.col("s") >= F.col("_mid"), F.col("c")).otherwise(0))
            .alias("y"),
        )
        .withColumn(
            "variant",
            F.when(hash_bucket(F.col("user_id"), n_buckets=2, salt=CUPED_SALT) == 0,
                   F.lit("A")).otherwise(F.lit("B")),
        )
    )
    sums = lambda df, keys: df.groupBy(*keys).agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    glob = sums(per_user, []).select(
        F.col("n").alias("gn"),
        F.col("sx").alias("gsx"),
        F.col("sy").alias("gsy"),
        F.col("sxy").alias("gsxy"),
        F.col("sxx").alias("gsxx"),
    )
    d = F.col("gn").cast("double")
    theta_num = F.col("gsxy").cast("double") - (
        F.col("gsx").cast("double") * F.col("gsy").cast("double") / d
    )
    theta_den = F.col("gsxx").cast("double") - (
        F.col("gsx").cast("double") * F.col("gsx").cast("double") / d
    )
    per_v = sums(per_user, ["variant"]).crossJoin(F.broadcast(glob))
    nv = F.col("n").cast("double")
    theta = theta_num / theta_den
    mean_x_v = F.col("sx").cast("double") / nv
    mean_x_all = F.col("gsx").cast("double") / d
    mean_y_v = F.col("sy").cast("double") / nv
    var_y = F.col("syy").cast("double") / nv - mean_y_v * mean_y_v
    cov_v = F.col("sxy").cast("double") / nv - mean_x_v * mean_y_v
    var_x_v = F.col("sxx").cast("double") / nv - mean_x_v * mean_x_v
    var_cuped = var_y - 2.0 * theta * cov_v + theta * theta * var_x_v
    return per_v.select(
        "variant",
        F.col("n").cast("bigint").alias("n_users"),
        F.round(mean_y_v / 100.0, 6).alias("mean_value"),
        F.round((mean_y_v - theta * (mean_x_v - mean_x_all)) / 100.0, 6).alias(
            "mean_value_cuped"
        ),
        F.round(theta, 6).alias("theta"),
        F.round(var_cuped / var_y, 6).alias("var_ratio"),
    ).orderBy("variant")


_CUPED_SQL = f"""
WITH rng AS (
  SELECT MIN(epoch_us(ts) // 1000000) AS mn,
         MAX(epoch_us(ts) // 1000000) AS mx
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN (epoch_us(ts) // 1000000)
                            < (rng.mn + rng.mx) // 2
                  THEN CAST(round(COALESCE(value, 0) * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN (epoch_us(ts) // 1000000)
                            >= (rng.mn + rng.mx) // 2
                  THEN CAST(round(COALESCE(value, 0) * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events, rng
  GROUP BY user_id
),
tagged AS (
  SELECT *,
         CASE WHEN (('0x' || substr(md5('{CUPED_SALT}'
                || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2) = 0
              THEN 'A' ELSE 'B' END AS variant
  FROM per_user
),
gtot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS gn,
         CAST(SUM(x) AS BIGINT) AS gsx,
         CAST(SUM(y) AS BIGINT) AS gsy,
         CAST(SUM(x * y) AS BIGINT) AS gsxy,
         CAST(SUM(x * x) AS BIGINT) AS gsxx
  FROM tagged
),
per_v AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM tagged GROUP BY variant
)
SELECT variant,
       n AS n_users,
       round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0, 6)
         AS mean_value,
       round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
              - ((CAST(gsxy AS DOUBLE)
                  - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE)
                    / CAST(gn AS DOUBLE))
                 / (CAST(gsxx AS DOUBLE)
                    - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
                      / CAST(gn AS DOUBLE)))
                * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                   - CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE)))
             / 100.0, 6) AS mean_value_cuped,
       round((CAST(gsxy AS DOUBLE)
              - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE)
                / CAST(gn AS DOUBLE))
             / (CAST(gsxx AS DOUBLE)
                - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
                  / CAST(gn AS DOUBLE)), 6) AS theta,
       round((
         (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
         - 2.0 * ((CAST(gsxy AS DOUBLE)
                   - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE)
                     / CAST(gn AS DOUBLE))
                  / (CAST(gsxx AS DOUBLE)
                     - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
                       / CAST(gn AS DOUBLE)))
               * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
         + ((CAST(gsxy AS DOUBLE)
             - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE)
               / CAST(gn AS DOUBLE))
            / (CAST(gsxx AS DOUBLE)
               - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
                 / CAST(gn AS DOUBLE)))
           * ((CAST(gsxy AS DOUBLE)
               - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE)
                 / CAST(gn AS DOUBLE))
              / (CAST(gsxx AS DOUBLE)
                 - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
                   / CAST(gn AS DOUBLE)))
           * (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
       ) / (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS var_ratio
FROM per_v, gtot
ORDER BY variant
"""


Z_CRIT = 1.96  # two-sided 5%


def q_events_conversion_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for conversion (any purchase) under the
    SAME derandomized A/B assignment as events_cuped_adjusted — the
    binary-metric half of the experimentation readout (CUPED covers
    the continuous metric). All inputs to the statistic are integer
    user/conversion counts from one keyed aggregate; p̂, the pooled
    SE, and z are identical scalar float expressions on the 1-row
    frame, so the full verdict (z, significance) hash-matches. Under
    a hash assignment with no real treatment, significance should be
    a 5% event — the audit's null behavior is part of the point."""
    from searchengine_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("long")).alias(
                "conv"
            )
        )
        .withColumn(
            "va", (hash_bucket(F.col("user_id"), n_buckets=2, salt=CUPED_SALT) == 0)
        )
    )
    agg = per_user.agg(
        F.sum(F.col("va").cast("long")).alias("n_a"),
        F.sum((~F.col("va")).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("va"), F.col("conv")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(~F.col("va"), F.col("conv")).otherwise(0)).alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    # degenerate pooled rate (0 or 1) forces pa == pb, so z is 0 by
    # definition — and the SE formula would divide by zero
    z = F.when(
        (F.col("conv_a") + F.col("conv_b") == 0)
        | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b")),
        F.lit(0.0),
    ).otherwise(F.round((pa - pb) / se, 6))
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.round(pa, 6).alias("rate_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        F.round(pb, 6).alias("rate_b"),
        z.alias("z_score"),
        (F.abs(z) > F.lit(Z_CRIT)).alias("significant"),
    )


_AB_Z_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         (('0x' || substr(md5('{{salt}}' || CAST(user_id AS VARCHAR)),
           1, 15))::BIGINT % 2) = 0 AS va
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(SUM(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN NOT va THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN va THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(SUM(CASE WHEN NOT va THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM per_user
)
SELECT n_a, conv_a,
       round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
       n_b, conv_b,
       round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN 0.0
            ELSE round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / CAST(n_a AS DOUBLE)
                       + 1.0 / CAST(n_b AS DOUBLE))), 6) END AS z_score,
       abs(CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN 0.0
            ELSE round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / CAST(n_a AS DOUBLE)
                       + 1.0 / CAST(n_b AS DOUBLE))), 6) END) > {Z_CRIT} AS significant
FROM agg
"""


QUERIES = {
    "events_conversion_ab": q_events_conversion_ab,
    "events_stickiness": q_events_stickiness,
    "events_weekday_hour_heatmap": q_events_weekday_hour_heatmap,
    "events_cuped_adjusted": q_events_cuped,
    "events_watermark_sizing": q_events_watermark_sizing,
    "events_transitions": q_events_transitions,
    "events_funnel_latency_quantiles": q_events_funnel_latency_quantiles,
    "events_anomaly_zscore": q_events_anomaly_zscore,
    "events_retention_cohorts": q_events_retention_cohorts,
    "events_funnel": q_events_funnel,
    "events_gap_fill_hourly": q_events_gap_fill_hourly,
    "events_user_growth": q_events_user_growth,
    "events_native_session_window": q_events_native_session_window,
    "events_variant_extract": q_events_variant_extract,
    "events_props_kv": q_events_props_kv,
    "events_range_frame": q_events_range_frame,
    "events_moving_avg": q_events_moving_avg,
    "events_inter_arrival": q_events_inter_arrival,
    "events_hourly_rollup": q_events_hourly,
    "events_running_total": q_events_running_total,
    "events_sessionize": q_events_sessionize,
    "events_type_stats": q_events_type_stats,
}

_STICKINESS_SQL = """
    WITH dau AS (
      SELECT date_trunc('day', ts) AS day_start,
             count(DISTINCT user_id)::BIGINT AS dau
      FROM events GROUP BY 1
    ),
    mau AS (SELECT count(DISTINCT user_id)::BIGINT AS mau FROM events)
    SELECT day_start, dau, mau.mau,
           round(dau * 1.0 / mau.mau, 6) AS stickiness
    FROM dau, mau
    ORDER BY day_start
"""

_HEATMAP_SQL = """
    SELECT ((epoch_us(ts) // 1000000) // 86400 + 3) % 7 AS dow,
           ((epoch_us(ts) // 1000000) % 86400) // 3600 AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY dow, hour
"""

ORACLES = {
    "events_stickiness": _STICKINESS_SQL,
    "events_weekday_hour_heatmap": _HEATMAP_SQL,
    "events_cuped_adjusted": _CUPED_SQL,
    "events_watermark_sizing": _WM_SQL,
    "events_conversion_ab": _AB_Z_SQL.replace("{salt}", CUPED_SALT),
    "events_funnel_latency_quantiles": _FUNNEL_LATENCY_SQL,
    "events_transitions": """
        WITH seq AS (
          SELECT event_type AS from_type,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS to_type
          FROM events
        )
        SELECT from_type, to_type, COUNT(*) AS n,
               ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY from_type), 6) AS p
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    """,
    "events_retention_cohorts": """
        WITH user_days AS (
          SELECT DISTINCT user_id, (epoch_us(ts) // 1000000) // 86400 AS day_idx
          FROM events
        ),
        cohorts AS (
          SELECT user_id, MIN(day_idx) AS cohort_day FROM user_days GROUP BY user_id
        )
        SELECT c.cohort_day, u.day_idx - c.cohort_day AS days_since,
               COUNT(DISTINCT u.user_id) AS active_users
        FROM user_days u JOIN cohorts c ON u.user_id = c.user_id
        GROUP BY 1, 2
    """,
    "events_funnel": """
        WITH base AS (
          SELECT user_id, event_type, (epoch_us(ts) // 1000000) AS ts_s FROM events
        ),
        t1 AS (
          SELECT user_id, MIN(ts_s) AS t1 FROM base
          WHERE event_type = 'signup' GROUP BY user_id
        ),
        t2 AS (
          SELECT b.user_id, MIN(b.ts_s) AS t2
          FROM base b JOIN t1 ON b.user_id = t1.user_id
          WHERE b.event_type = 'click'
            AND b.ts_s >= t1.t1 AND b.ts_s <= t1.t1 + 86400
          GROUP BY b.user_id
        ),
        t3 AS (
          SELECT b.user_id, MIN(b.ts_s) AS t3
          FROM base b JOIN t2 ON b.user_id = t2.user_id
          WHERE b.event_type = 'purchase'
            AND b.ts_s >= t2.t2 AND b.ts_s <= t2.t2 + 86400
          GROUP BY b.user_id
        )
        SELECT COUNT(*) AS n_signup,
               COUNT(t2.t2) AS n_signup_click,
               COUNT(t3.t3) AS n_signup_click_purchase
        FROM t1
        LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
    # Integer epoch-hour buckets; DuckDB's // truncates but all event
    # times are post-epoch so it agrees with the Spark floor.
    "events_gap_fill_hourly": """
        WITH hourly AS (
          SELECT user_id, (epoch_us(ts) // 1000000) // 3600 AS hour_idx,
                 CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS v
          FROM events GROUP BY 1, 2
        ),
        spans AS (
          SELECT user_id, MIN(hour_idx) AS h0, MAX(hour_idx) AS h1
          FROM hourly GROUP BY user_id
        ),
        grid AS (
          SELECT user_id, unnest(generate_series(h0, h1)) AS hour_idx FROM spans
        )
        SELECT g.user_id, g.hour_idx,
               COALESCE(h.v, 0) AS hour_value,
               LAST_VALUE(h.v IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.hour_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS ffill_value
        FROM grid g LEFT JOIN hourly h
          ON g.user_id = h.user_id AND g.hour_idx = h.hour_idx
    """,
    "events_user_growth": """
        WITH first_day AS (
          SELECT user_id, MIN((epoch_us(ts) // 1000000) // 86400) AS day_idx
          FROM events GROUP BY user_id
        ),
        per_day AS (
          SELECT day_idx, COUNT(*) AS new_users FROM first_day GROUP BY day_idx
        )
        SELECT day_idx, new_users,
               CAST(SUM(new_users) OVER (
                 ORDER BY day_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cumulative_users
        FROM per_day
    """,
    # Boundary semantics: gap >= 30min starts a new session (Spark's
    # window is [start, last_ts + gap) — an event AT the boundary is
    # outside it), hence >= not > in the flag below.
    "events_native_session_window": f"""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                      WHEN ts - LAG(ts) OVER w >= INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1
                      ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessioned AS (
          SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          ) AS sid
          FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS session_value
        FROM sessioned
        GROUP BY user_id, sid
    """,
    "events_variant_extract": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                               THEN 1 END) AS BIGINT) AS n_big_k
        FROM events
        GROUP BY event_type
    """,
    # RANGE frame on integer epoch SECONDS in both engines (Spark's
    # cast-to-long truncates sub-second precision; the oracle must
    # bucket peers identically or frame membership differs).
    "events_range_frame": f"""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS trailing_10m_value,
               COUNT(*) OVER w AS trailing_10m_events
        FROM events
        WINDOW w AS (
          PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
          RANGE BETWEEN {RANGE_FRAME_SECONDS} PRECEDING AND CURRENT ROW
        )
    """,
    "events_props_kv": """
        SELECT event_id, k AS key,
               CAST(json_extract(props, '$.' || k) AS BIGINT) AS val
        FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
    """,
    "events_anomaly_zscore": f"""
        WITH stats AS (
          SELECT event_id, user_id, event_type, value,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
                 COUNT(*) OVER w AS n,
                 CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS s,
                 CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                          * CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS s2
          FROM events
          WINDOW w AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {ANOMALY_HISTORY} PRECEDING AND 1 PRECEDING
          )
        ),
        scored AS (
          SELECT event_id, user_id, event_type, value,
                 (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1) AS var,
                 c - CAST(s AS DOUBLE) / n AS dev
          FROM stats WHERE n >= {ANOMALY_MIN_N}
        )
        SELECT event_id, user_id, event_type, value,
               round(dev / sqrt(var), 6) AS z
        FROM scored
        WHERE var > 0 AND abs(round(dev / sqrt(var), 6)) >= {ANOMALY_Z}
    """,
    "events_moving_avg": """
        SELECT event_id, user_id,
               ROUND(
                 CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 6) AS moving_avg
        FROM events
        WINDOW w AS (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
        )
    """,
    "events_inter_arrival": """
        SELECT event_id, user_id, event_type,
               (epoch_us(ts) // 1000000) - LAG(epoch_us(ts) // 1000000) OVER w AS secs_since_prev,
               LEAD(epoch_us(ts) // 1000000) OVER w - (epoch_us(ts) // 1000000) AS secs_until_next
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "events_hourly_rollup": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
    "events_running_total": """
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS seq
        FROM events
    """,
    "events_sessionize": _SESSION_SQL,
    "events_type_stats": """
        SELECT event_type, COUNT(*) AS n_events,
               MIN(value) AS min_value, MAX(value) AS max_value,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
    """,
}
