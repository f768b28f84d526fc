"""OHLC downsampling, ACF, and seasonal-naive MASE invariants."""

import math
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_seconds, exact_floor_div
from searchengine_spark.io import load_table
from searchengine_spark.relational.timeseries import (
    ACF_MAX_LAG,
    SEASON_HOURS,
    q_acf_lags,
    q_ohlc_hourly,
    q_seasonal_naive_mase,
)


def _write_events(spark, pdf: pd.DataFrame) -> str:
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_ohlc_planted_exact(spark):
    # same second for rows 2 and 3: event_id must tie-break open/close
    pdf = pd.DataFrame(
        {
            "event_id": [4, 1, 3, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:59:59",
                    "2024-01-01 00:00:01",
                    "2024-01-01 00:30:00",
                    "2024-01-01 00:30:00",
                ]
            ),
            "event_type": ["view"] * 4,
            "value": [7.5, 2.0, 9.0, -1.25],
        }
    )
    d = _write_events(spark, pdf)
    rows = q_ohlc_hourly(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["open"] == 2.0  # event_id 1, earliest second
    assert r["close"] == 7.5  # event_id 4, latest second
    assert r["high"] == 9.0 and r["low"] == -1.25 and r["n_events"] == 4


def test_ohlc_brackets_and_counts(spark, sf_dir):
    out = q_ohlc_hourly(spark, sf_dir)
    bad = out.filter(
        (F.col("low") > F.col("open"))
        | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
        | (F.col("n_events") < 1)
    ).count()
    assert bad == 0
    # partitions cover exactly the observed (type, hour) grid
    ev = load_table(spark, sf_dir, "events")
    grid = ev.select(
        "event_type",
        exact_floor_div(event_time_seconds(ev, "ts"), 3600).alias("hour_idx"),
    ).distinct()
    assert out.count() == grid.count()


def test_acf_bounds_and_lag1_positive(spark, sf_dir):
    rows = {r["lag"]: r for r in q_acf_lags(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, ACF_MAX_LAG + 1))
    for r in rows.values():
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
        assert r["n_hours"] > ACF_MAX_LAG
    # hourly event counts follow a diurnal cycle: adjacent hours correlate
    assert rows[1]["acf"] > 0


def test_acf_matches_local_recurrence(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            exact_floor_div(event_time_seconds(ev, "ts"), 3600).alias("h")
        )
        .count()
        .collect()
    )
    xs = [r["count"] for r in sorted(hourly, key=lambda r: r["h"])]
    mean = sum(xs) / len(xs)
    den = sum((x - mean) ** 2 for x in xs)
    for r in q_acf_lags(spark, sf_dir).collect():
        k = r["lag"]
        num = sum((xs[t] - mean) * (xs[t - k] - mean) for t in range(k, len(xs)))
        assert math.isclose(r["acf"], num / den, abs_tol=1e-4), k


def test_seasonal_naive_mase_zero_on_periodic_series(spark):
    # value repeats exactly every SEASON_HOURS -> seasonal error 0
    hours = list(range(SEASON_HOURS * 2))
    pdf = pd.DataFrame(
        {
            "event_id": range(len(hours)),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(hours, unit="h"),
            "event_type": ["view"] * len(hours),
            "value": [float(h % SEASON_HOURS) + 1.0 for h in hours],
        }
    )
    d = _write_events(spark, pdf)
    rows = q_seasonal_naive_mase(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_eval"] == SEASON_HOURS
    assert r["mase"] == 0.0 and r["smape"] == 0.0


def test_seasonal_naive_mase_gap_alignment(spark):
    # a gap hour must not shift the seasonal alignment (join on
    # hour_idx - SEASON_HOURS, not row-lag): drop one hour in week 1,
    # the week-2 twin of every REMAINING hour still matches exactly.
    hours = [h for h in range(SEASON_HOURS * 2) if h != 5]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(hours)),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(hours, unit="h"),
            "event_type": ["view"] * len(hours),
            "value": [float(h % SEASON_HOURS) + 1.0 for h in hours],
        }
    )
    d = _write_events(spark, pdf)
    r = q_seasonal_naive_mase(spark, d).collect()[0]
    # hour 5+168 has no week-1 twin -> excluded from eval
    assert r["n_eval"] == SEASON_HOURS - 1
    assert r["mase"] == 0.0


def test_mase_positive_on_real_data(spark, sf_dir):
    for r in q_seasonal_naive_mase(spark, sf_dir).collect():
        assert r["n_eval"] > 0
        assert r["mase"] is not None and r["mase"] >= 0.0
        assert 0.0 <= r["smape"] <= 2.0


def test_cusum_finds_planted_level_shift(spark):
    # 48 quiet hours (1 event) then 48 loud hours (5 events): the
    # |CUSUM| peak sits exactly at the last pre-shift hour
    from searchengine_spark.relational.timeseries import q_cusum_changepoint

    rows = []
    eid = 0
    for h in range(96):
        for j in range(1 if h < 48 else 5):
            rows.append((eid, h, j))
            eid += 1
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([r[1] for r in rows], unit="h")
            + pd.to_timedelta([r[2] for r in rows], unit="s"),
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
        }
    )
    d = _write_events(spark, pdf)
    r = q_cusum_changepoint(spark, d).collect()
    assert len(r) == 1
    base_hour = int(pd.Timestamp("2024-01-01").timestamp()) // 3600
    assert r[0]["cp_hour_idx"] == base_hour + 47
    # mean is 3: pre-shift hours each contribute -2 -> trough of -96
    assert r[0]["cusum_at_cp"] == -96.0
    assert r[0]["n_hours"] == 96


def test_cusum_runs_per_type_on_real_data(spark, sf_dir):
    from searchengine_spark.io import load_table
    from searchengine_spark.relational.timeseries import q_cusum_changepoint

    out = q_cusum_changepoint(spark, sf_dir).collect()
    n_types = load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    assert len(out) == n_types
    for r in out:
        assert r["n_hours"] > 0


def test_holt_recovers_exact_linear_trend(spark):
    # y_t = 1000 + 50t cents: Holt with l1=y1, b1=y2-y1 tracks a noise-
    # free linear series exactly -> every one-step error is 0 and the
    # forecasts continue the line.
    import datetime as dt

    from searchengine_spark.relational.timeseries import q_holt_forecast

    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "event_id": range(24),
            "ts": [t0 + dt.timedelta(hours=h) for h in range(24)],
            "user_id": [1] * 24,
            "event_type": ["view"] * 24,
            "value": [(1000 + 50 * h) / 100.0 for h in range(24)],
            "props": ["{}"] * 24,
        }
    )
    d = _write_events(spark, pdf)
    r = q_holt_forecast(spark, d).collect()[0]
    assert r.n_hours == 24
    assert r.one_step_mae == 0.0
    assert r.level == (1000 + 50 * 23) / 100.0
    assert r.trend == 0.5
    assert r.fc_1h == r.level + 0.5
    assert r.fc_3h == r.level + 1.5


def test_holt_parity_on_planted_series(spark):
    import datetime as dt

    from searchengine_spark.relational.timeseries import _HOLT_SQL, q_holt_forecast
    from tests.helpers import assert_matches_oracle

    t0 = dt.datetime(2024, 1, 1)
    # deterministic bumpy series exercises every branch of the fold
    vals = [10.0 + (h * 37 % 11) - (h % 3) * 2.5 for h in range(48)]
    pdf = pd.DataFrame(
        {
            "event_id": range(48),
            "ts": [t0 + dt.timedelta(hours=h) for h in range(48)],
            "user_id": [h % 5 for h in range(48)],
            "event_type": ["view"] * 48,
            "value": vals,
            "props": ["{}"] * 48,
        }
    )
    d = _write_events(spark, pdf)
    df = q_holt_forecast(spark, d)
    assert_matches_oracle(df, _HOLT_SQL, d, "events_holt_forecast planted")
    r = df.collect()[0]
    assert r.one_step_mae > 0.0
