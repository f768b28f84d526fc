"""Trailing-window anomaly z-score (relational/events.py).

Oracle parity runs in test_oracle_parity; here: a planted spike is
flagged, steady traffic isn't, and the trailing frame excludes the
current row (no self-contamination)."""

import datetime

from pyspark.sql import functions as F

from searchengine_spark.relational.events import (
    ANOMALY_MIN_N,
    q_events_anomaly_zscore,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.repartition(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _mk(i, user, value):
    return (
        i,
        datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
        user,
        "click",
        float(value),
        "{}",
    )


def test_planted_spike_is_flagged_and_steady_user_is_not(spark, tmp_path):
    # user 1: gentle noise then a massive spike; user 2: flat-ish.
    rows = [_mk(i, 1, 10.0 + (i % 3)) for i in range(12)]
    rows.append(_mk(12, 1, 500.0))
    rows += [_mk(100 + i, 2, 20.0 + (i % 2)) for i in range(12)]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = q_events_anomaly_zscore(spark, sf_dir).collect()
    assert [r["event_id"] for r in got] == [12]
    assert got[0]["z"] > 3


def test_spike_does_not_contaminate_its_own_baseline(spark, tmp_path):
    """The frame ends at 1 PRECEDING: the spike's own value must not
    inflate the std it is judged against (a CURRENT ROW frame would
    shrink z below threshold for moderate spikes)."""
    rows = [_mk(i, 1, 10.0) for i in range(ANOMALY_MIN_N)]
    # constant history -> zero variance -> spike yields NULL z (not a
    # crash, not a flag): the zero-variance guard path
    rows.append(_mk(50, 1, 1000.0))
    sf_dir = _write_events(spark, tmp_path, rows)
    assert q_events_anomaly_zscore(spark, sf_dir).count() == 0


def test_min_history_gate(spark, tmp_path):
    """With fewer than ANOMALY_MIN_N prior events nothing is scored,
    however extreme the value."""
    rows = [_mk(i, 1, 10.0 + i) for i in range(ANOMALY_MIN_N - 1)]
    rows.append(_mk(30, 1, 9999.0))
    sf_dir = _write_events(spark, tmp_path, rows)
    assert q_events_anomaly_zscore(spark, sf_dir).count() == 0
