"""Direct tests for event_time.py: the NTZ<->instant converters must
be bit-exact, session-timezone-invariant (incl. inside DST gaps,
where cast-based conversions are lossy), and floor-exact for
pre-epoch times (matching DuckDB's epoch_us // 1000000)."""

import calendar
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from searchengine_spark.event_time import (
    epoch_micros_to_ntz,
    event_time_micros,
    event_time_seconds,
    ntz_to_epoch_micros,
    with_instant_ts,
)

# Wall-clock fixtures chosen to break naive implementations:
TRICKY = [
    datetime(1970, 1, 1, 0, 0, 0),
    datetime(1969, 12, 31, 23, 59, 59, 999999),     # pre-epoch
    datetime(1969, 7, 20, 20, 17, 40, 500000),
    datetime(2024, 3, 10, 2, 30, 0),                # US DST spring-forward gap
    datetime(2024, 11, 3, 1, 30, 0),                # US DST fall-back ambiguity
    datetime(2024, 2, 29, 12, 0, 0, 123456),        # leap day + micros
    datetime(1999, 12, 31, 23, 59, 59, 999999),
    datetime(2250, 6, 15, 6, 7, 8, 90),             # far future
]


def _utc_micros(dt: datetime) -> int:
    return calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond


def _ntz_df(spark, dts):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(dts)], "i long, ts timestamp_ntz")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    return df


@pytest.fixture()
def tz_sessions(spark):
    """Run a check under several session time zones, restoring after."""
    original = spark.conf.get("spark.sql.session.timeZone")

    def run(check):
        try:
            for tz in ("UTC", "America/New_York", "Asia/Kathmandu", "Pacific/Kiritimati"):
                spark.conf.set("spark.sql.session.timeZone", tz)
                check(tz)
        finally:
            spark.conf.set("spark.sql.session.timeZone", original)

    return run


def test_ntz_to_micros_is_utc_in_every_session_tz(spark, tz_sessions):
    df = _ntz_df(spark, TRICKY)
    expected = {i: _utc_micros(d) for i, d in enumerate(TRICKY)}

    def check(tz):
        got = {
            r.i: r.us
            for r in df.select("i", ntz_to_epoch_micros("ts").alias("us")).collect()
        }
        assert got == expected, f"session tz {tz}"

    tz_sessions(check)


def test_micros_to_ntz_roundtrip_every_session_tz(spark, tz_sessions):
    df = _ntz_df(spark, TRICKY)

    def check(tz):
        back = df.select(
            "i", epoch_micros_to_ntz(ntz_to_epoch_micros("ts")).alias("ts2"), "ts"
        )
        assert dict(back.dtypes)["ts2"] == "timestamp_ntz"
        for r in back.collect():
            assert r.ts2 == r.ts, f"session tz {tz}: {r.ts} -> {r.ts2}"

    tz_sessions(check)


def test_event_time_seconds_semantics(spark):
    """FLOOR division (Spark's native cast semantics): -0.000001s ->
    -1. Matches DuckDB's truncating `//` for all POST-epoch times —
    the documented divergence is pre-epoch sub-second only."""
    import duckdb

    df = _ntz_df(spark, TRICKY)
    got = {r.i: r.s for r in df.select("i", event_time_seconds(df, "ts").alias("s")).collect()}
    con = duckdb.connect()
    for i, d in enumerate(TRICKY):
        assert got[i] == _utc_micros(d) // 1_000_000, (d, got[i])  # python floor
        if d >= datetime(1970, 1, 1):
            (exp,) = con.execute(
                "SELECT epoch_us(CAST(? AS TIMESTAMP)) // 1000000", [d]
            ).fetchone()
            assert got[i] == exp, (d, got[i], exp)
    # the pre-epoch fixture exercises the floor branch
    assert got[1] == -1


def test_event_time_micros_accepts_both_flavors(spark):
    ntz = _ntz_df(spark, TRICKY[:3])
    ltz = with_instant_ts(ntz, "ts")
    assert dict(ltz.dtypes)["ts"] == "timestamp"
    a = {r.i: r.us for r in ntz.select("i", event_time_micros(ntz, "ts").alias("us")).collect()}
    b = {r.i: r.us for r in ltz.select("i", event_time_micros(ltz, "ts").alias("us")).collect()}
    assert a == b  # same instant regardless of flavor


def test_exact_floor_div_far_beyond_double_mantissa(spark):
    """The decimal floor-div stays exact where double division is off
    by ULPs: micros near the bigint extremes."""
    from searchengine_spark.event_time import _exact_floor_div

    vals = [
        2**62 + 123_456,          # ~146k years of micros
        -(2**62) - 1,
        9_007_199_254_740_993,    # 2^53 + 1: first double-unrepresentable int
        2**63 - 1,                # Long.MAX
        -(2**63),                 # Long.MIN: floor(MIN/d)*d < MIN — the
        -(2**63) + 1,             # wrap hazard block for bigint subtraction
    ]
    df = spark.createDataFrame([(v,) for v in vals], "us long")
    got = [r.q for r in df.select(_exact_floor_div(F.col("us"), 1_000_000).alias("q")).collect()]
    assert got == [v // 1_000_000 for v in vals]
