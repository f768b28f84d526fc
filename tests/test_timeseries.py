"""Rolling distinct actives, EWMA smoothing, chi-square invariants."""

import math

from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_seconds, exact_floor_div
from searchengine_spark.io import load_table
from searchengine_spark.relational.timeseries import (
    EWMA_WEIGHTS,
    EWMA_WINDOW,
    ROLLING_DAYS,
    q_chi2_type_hour,
    q_ewma_hourly_value,
    q_rolling_active_users,
)


def test_rolling_actives_bracketed_by_daily_and_total(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day = exact_floor_div(event_time_seconds(ev, "ts"), 86400)
    daily = {
        r["d"]: r["n"]
        for r in ev.groupBy(day.alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total_users = ev.select("user_id").distinct().count()
    rows = q_rolling_active_users(spark, sf_dir).collect()
    assert set(r["report_day"] for r in rows) == set(daily)
    for r in rows:
        # window superset of the single day, subset of the universe
        assert daily[r["report_day"]] <= r["active_users_7d"] <= total_users


def test_rolling_actives_exact_on_planted_frame(spark):
    # users 1,2 on day 0; user 3 on day 10 — day 10's 7d window must
    # NOT see day 0 (10 - 0 >= ROLLING_DAYS)
    import pandas as pd

    assert ROLLING_DAYS == 7
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 2, 3],
                "ts": pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-11"]),
            }
        )
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        r["report_day"]: r["active_users_7d"]
        for r in q_rolling_active_users(spark, d).collect()
    }
    days = sorted(out)
    assert out[days[0]] == 2 and out[days[1]] == 1


def test_ewma_matches_local_recurrence(spark, sf_dir):
    rows = q_ewma_hourly_value(spark, sf_dir).collect()
    series: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["hour_idx"])):
        series.setdefault(r["event_type"], []).append(r)
    assert sum(EWMA_WEIGHTS) < 1.0 and len(EWMA_WEIGHTS) == EWMA_WINDOW
    for ser in series.values():
        xs = [r["hourly_value"] for r in ser]
        for t, r in enumerate(ser):
            want = sum(
                EWMA_WEIGHTS[j] * xs[t - j]
                for j in range(EWMA_WINDOW)
                if t - j >= 0
            )
            assert math.isclose(r["ewma_value"], want, abs_tol=2e-5), (
                r["event_type"],
                r["hour_idx"],
            )


def test_chi2_nonnegative_and_dof(spark, sf_dir):
    row = q_chi2_type_hour(spark, sf_dir).collect()[0]
    assert row["chi2"] >= 0.0
    assert row["dof"] >= 1
    assert row["n_cells"] >= row["dof"]
