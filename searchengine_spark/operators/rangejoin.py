"""Pure range-overlap join via bin bucketing (no equi key at all).

The interval joins elsewhere in the repo
(`relational/advanced.q_clicks_before_purchase`,
`streaming/events.view_purchase_join_stream`) all carry an equi key
(user_id) that bounds the join; a join on NOTHING BUT interval
overlap has no such key, and Spark's only native plan for it is a
nested-loop/cartesian — the thing `tests/test_plan_quality.py`
forbids. The standard fix (Databricks' range-join optimization,
KDB's window join) is BINNING: chop the value domain into fixed-size
bins, explode each interval into the bins it covers, equi-join on
the bin id, then apply the exact overlap residual. Fan-out per row
is interval_length/bin_size (bounded by choosing bin ~ median
interval), and duplicate pair hits across shared bins are removed
WITHOUT a distinct by emitting only in the pair's FIRST shared bin
(`bin == greatest(l_first_bin, r_first_bin)` — dedup-free, no extra
shuffle).

Intervals are closed [start, end] in integer units (seconds here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BIN_SECONDS = 3600


def _bin(col, bin_size: int):
    """Floor-division bin id; accepts a column name or Column.
    Double-division floor is exact here (epoch seconds < 2^53)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / bin_size).cast("bigint")


def overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_size: int = BIN_SECONDS,
) -> DataFrame:
    """All (left, right) pairs whose closed intervals overlap —
    binned equi-join + exact residual, each pair emitted exactly
    once. Column names must be disjoint between the two sides."""
    lb = left.withColumn(
        "_bin",
        F.explode(F.sequence(_bin(l_start, bin_size), _bin(l_end, bin_size))),
    )
    rb = right.withColumn(
        "_bin",
        F.explode(F.sequence(_bin(r_start, bin_size), _bin(r_end, bin_size))),
    )
    return (
        lb.join(rb, "_bin")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            # first-shared-bin emission: dedup without a distinct
            & (
                F.col("_bin")
                == F.greatest(_bin(l_start, bin_size), _bin(r_start, bin_size))
            )
        )
        .drop("_bin")
    )


# --------------------------------------------------------------- queries


def q_session_spike_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user sessions overlap a traffic spike? Sessions (30-min
    gap sessionize) joined to spike hours (hours whose event count
    exceeds 2x the mean hourly count — a scale-free integer
    comparison: n * n_hours > 2 * total) purely on time overlap.
    There is no shared key, so this is the binned range join; the
    oracle states the plain BETWEEN join."""
    from pyspark.sql import Window

    from searchengine_spark.event_time import event_time_seconds
    from searchengine_spark.io import load_table
    from searchengine_spark.relational.events import SESSION_GAP_MIN

    ev = load_table(spark, sf_dir, "events")
    ts_s = event_time_seconds(ev, "ts")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sessions = (
        ev.withColumn(
            "new_session",
            (ts_s - F.lag(ts_s, 1, None).over(w) > SESSION_GAP_MIN * 60).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum(F.coalesce(F.col("new_session"), F.lit(1))).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min(ts_s).alias("s_start"), F.max(ts_s).alias("s_end"))
    )

    # Persisted: hours (one row per time bin) feeds both the total
    # aggregate and the spike filter — one events scan instead of two.
    hours = (
        ev.select(_bin(event_time_seconds(ev, "ts"), BIN_SECONDS).alias("hb"))
        .groupBy("hb")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    tot = hours.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_hours")
    )
    spikes = (
        hours.crossJoin(F.broadcast(tot))
        .filter(F.col("n") * F.col("n_hours") > 2 * F.col("total"))
        .select(
            (F.col("hb") * BIN_SECONDS).alias("spike_start"),
            (F.col("hb") * BIN_SECONDS + (BIN_SECONDS - 1)).alias("spike_end"),
        )
    )

    return (
        overlap_join_binned(
            sessions,
            spikes,
            l_start="s_start",
            l_end="s_end",
            r_start="spike_start",
            r_end="spike_end",
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_spike_hours"))
        .orderBy("user_id", "session_id")
    )


_SPIKE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN (epoch_us(ts) // 1000000) - LAG((epoch_us(ts) // 1000000)) OVER w > 1800
              THEN 1
              WHEN LAG((epoch_us(ts) // 1000000)) OVER w IS NULL THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id, session_id,
         MIN(epoch_us(ts) // 1000000) AS s_start,
         MAX(epoch_us(ts) // 1000000) AS s_end
  FROM sessioned GROUP BY user_id, session_id
), hours AS (
  SELECT (epoch_us(ts) // 1000000) // {BIN_SECONDS} AS hb, COUNT(*) AS n
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_hours FROM hours
), spikes AS (
  SELECT hb FROM hours, tot WHERE n * n_hours > 2 * total
)
SELECT s.user_id, s.session_id, COUNT(*) AS n_spike_hours
FROM sessions s JOIN spikes
  ON spikes.hb BETWEEN s.s_start // {BIN_SECONDS} AND s.s_end // {BIN_SECONDS}
GROUP BY s.user_id, s.session_id
ORDER BY s.user_id, s.session_id
"""


QUERIES = {"rel_session_spike_overlap": q_session_spike_overlap}
ORACLES = {"rel_session_spike_overlap": _SPIKE_SQL}
