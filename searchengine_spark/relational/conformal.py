"""Split-conformal anomaly detection on the hourly value series.

The z-score monitor (events_anomaly_zscore) assumes the residuals
are Gaussian-ish; conformal prediction (Vovk et al., public) makes
NO distributional assumption: calibrate the (1-alpha)-quantile of
the nonconformity score on a held-out time prefix, and the
exceedance rate on future data is guaranteed <= alpha (plus the
finite-sample +1 correction). This is the alarm-threshold discipline
a production monitor actually wants — "at most ~20% false alarms
under exchangeability", not "if the residuals happen to be normal".

Construction per event_type:
- nonconformity = |hourly cents - cents 24h earlier| (the seasonal-
  naive residual, expressed as a calendar equi-join like
  events_seasonal_naive_mase — gap-correct, no row-lag misalignment);
- time-ordered split: the first floor(n/2) hours calibrate, the rest
  are scored (time-ordered, never random — the threshold must be
  computable before the data it judges);
- threshold = k-th smallest calibration score with
  k = ceil((n_cal + 1) * (1 - alpha)) — the finite-sample conformal
  quantile; if k > n_cal the threshold is undefined (NULL) and
  nothing is flagged (the honest degenerate answer for tiny groups);
- a test hour is anomalous iff its score EXCEEDS the threshold
  (strict — scores equal to the quantile are conforming).

Everything up to the final rate is exact integer arithmetic; the
ranking windows partition per event_type over hour-bounded frames
(calendar-bounded, never row-bounded). No UDFs, no global windows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_seconds, exact_floor_div
from searchengine_spark.io import load_table

CONF_ALPHA = 0.2
CONF_SEASON_H = 24


def q_events_conformal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.coalesce(F.round(F.col("value") * 100).cast("bigint"), F.lit(0))
    hourly = ev.groupBy(
        "event_type",
        exact_floor_div(event_time_seconds(ev, "ts"), 3600).alias("hour_idx"),
    ).agg(F.sum(cents).alias("c"))

    season = hourly.select(
        "event_type",
        (F.col("hour_idx") + CONF_SEASON_H).alias("hour_idx"),
        F.col("c").alias("c_season"),
    )
    scores = hourly.join(season, ["event_type", "hour_idx"]).select(
        "event_type",
        "hour_idx",
        F.abs(F.col("c") - F.col("c_season")).alias("score"),
    )

    by_time = Window.partitionBy("event_type").orderBy("hour_idx")
    per_type = Window.partitionBy("event_type")
    # Persisted (r14; guide §5 / §1.2 step 1): the split frame feeds
    # cal AND test, test itself feeds TWO aggregates and thresh two
    # joins — left lazy, the hourly aggregate + seasonal join + both
    # windows re-execute 4-6x inside one result plan.
    split = (
        scores.withColumn("r", F.row_number().over(by_time))
        .withColumn("n", F.count(F.lit(1)).over(per_type))
        .withColumn("is_cal", F.col("r") <= F.floor(F.col("n") / 2))
    ).persist()
    cal = split.filter(F.col("is_cal"))
    test = split.filter(~F.col("is_cal"))

    cal_rank = Window.partitionBy("event_type").orderBy(
        F.asc("score"), F.asc("hour_idx")
    )
    thresh = (
        cal.withColumn("cr", F.row_number().over(cal_rank))
        .withColumn("n_cal", F.count(F.lit(1)).over(per_type))
        .withColumn(
            "k",
            F.ceil(
                (F.col("n_cal") + 1).cast("double") * F.lit(1.0 - CONF_ALPHA)
            ).cast("bigint"),
        )
        .filter(F.col("cr") == F.col("k"))
        .select(
            "event_type",
            F.col("n_cal").cast("bigint").alias("n_cal"),
            F.col("score").alias("q_hat"),
        )
    ).persist()
    out = (
        test.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_test"))
        .join(thresh, "event_type", "left")
        .join(
            test.join(thresh.select("event_type", "q_hat"), "event_type")
            .filter(F.col("score") > F.col("q_hat"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("_nf")),
            "event_type",
            "left",
        )
        .select(
            "event_type",
            "n_cal",
            "n_test",
            F.round(F.col("q_hat").cast("double") / F.lit(100.0), 6).alias(
                "threshold"
            ),
            F.coalesce(F.col("_nf"), F.lit(0)).cast("bigint").alias("n_flagged"),
            F.round(
                F.coalesce(F.col("_nf"), F.lit(0)).cast("double")
                / F.col("n_test").cast("double"),
                6,
            ).alias("flag_rate"),
        )
        .orderBy("event_type")
    )
    from searchengine_spark.io import cut_and_release

    return cut_and_release(out, split, thresh)


_CONF_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS hour_idx,
         CAST(SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT)
           AS c
  FROM events GROUP BY 1, 2
), scores AS (
  SELECT cur.event_type, cur.hour_idx,
         abs(cur.c - s.c) AS score
  FROM hourly cur
  JOIN hourly s ON s.event_type = cur.event_type
                AND s.hour_idx = cur.hour_idx - {CONF_SEASON_H}
), split AS (
  SELECT event_type, hour_idx, score,
         row_number() OVER (PARTITION BY event_type ORDER BY hour_idx) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM scores
), cal AS (
  SELECT * FROM split WHERE r <= n // 2
), test AS (
  SELECT * FROM split WHERE r > n // 2
), thresh AS (
  SELECT event_type, n_cal, score AS q_hat FROM (
    SELECT event_type, score, hour_idx,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY score ASC, hour_idx ASC) AS cr,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_cal
    FROM cal
  )
  WHERE cr = CAST(ceil(CAST(n_cal + 1 AS DOUBLE) * {1.0 - CONF_ALPHA!r})
                  AS BIGINT)
), nt AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_test
  FROM test GROUP BY event_type
), nf AS (
  SELECT t.event_type, CAST(count(*) AS BIGINT) AS nf
  FROM test t JOIN thresh th ON t.event_type = th.event_type
  WHERE t.score > th.q_hat
  GROUP BY t.event_type
)
SELECT nt.event_type,
       thresh.n_cal,
       nt.n_test,
       round(CAST(thresh.q_hat AS DOUBLE) / 100.0, 6) AS threshold,
       COALESCE(nf.nf, 0) AS n_flagged,
       round(CAST(COALESCE(nf.nf, 0) AS DOUBLE) / CAST(nt.n_test AS DOUBLE), 6)
         AS flag_rate
FROM nt
LEFT JOIN thresh ON nt.event_type = thresh.event_type
LEFT JOIN nf ON nt.event_type = nf.event_type
ORDER BY nt.event_type
"""

QUERIES = {"events_conformal_anomaly": q_events_conformal_anomaly}
ORACLES = {"events_conformal_anomaly": _CONF_SQL}
