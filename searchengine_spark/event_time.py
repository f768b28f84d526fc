"""Deterministic event-time conversions (TIMESTAMP_NTZ <-> instant).

Canonical event time in this engine is TIMESTAMP_NTZ — "naive UTC"
wall-clock, which is what the testdata parquet carries
(isAdjustedToUTC=false) and exactly what a naive-timestamp engine
(DuckDB) sees, so oracle comparisons never depend on a session time
zone.

Spark's event-time machinery (withWatermark, unix_micros) demands
TIMESTAMP_LTZ, and every built-in NTZ->LTZ route (`cast`,
`to_utc_timestamp`, even `timestampdiff` against an NTZ epoch)
interprets the wall clock in the SESSION time zone — nondeterministic
across sessions, and lossy inside DST gaps (2024-03-10 02:30 does not
exist in America/New_York). The converters here use calendar-component
arithmetic only, so the mapping wall-clock <-> micros-since-epoch is
the UTC one in every session.

All expressions are pure Column arithmetic — whole-stage codegen,
no UDFs, streaming-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000
_US_PER_MIN = 60_000_000


def _exact_floor_div(col: Column, divisor: int) -> Column:
    """Floor division exact over the full bigint range: subtract the
    positive remainder AFTER widening to decimal (floor(MIN/d)*d can
    undershoot Long.MIN, so bigint subtraction would wrap), then
    divide in decimal so the quotient never rounds through a double's
    53-bit mantissa."""
    rem = F.pmod(col, F.lit(divisor))
    return ((col.cast("decimal(38,0)") - rem) / F.lit(divisor)).cast("bigint")


def ntz_to_epoch_micros(col: Column | str) -> Column:
    """TIMESTAMP_NTZ wall clock -> micros since 1970-01-01 00:00:00,
    treating the wall clock as UTC. Component arithmetic only — never
    touches a time zone."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.unix_date(c.cast("date")) * F.lit(_US_PER_DAY).cast("bigint")
        + F.hour(c).cast("bigint") * _US_PER_HOUR
        + F.minute(c).cast("bigint") * _US_PER_MIN
        # extract(SECOND) is decimal(8,6): whole seconds + micros.
        + (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("bigint")
    )


def epoch_micros_to_ntz(col: Column) -> Column:
    """Micros since epoch -> TIMESTAMP_NTZ (UTC wall clock), via
    make_timestamp_ntz on computed components. Inverse of
    :func:`ntz_to_epoch_micros` for any session time zone."""
    day = _exact_floor_div(col, _US_PER_DAY).cast("int")
    rem = col - day.cast("bigint") * _US_PER_DAY
    d = F.date_add(F.lit("1970-01-01").cast("date"), day)
    return F.make_timestamp_ntz(
        F.year(d),
        F.month(d),
        F.dayofmonth(d),
        _exact_floor_div(rem, _US_PER_HOUR).cast("int"),
        F.pmod(_exact_floor_div(rem, _US_PER_MIN), F.lit(60)).cast("int"),
        F.pmod(rem, F.lit(_US_PER_MIN)).cast("decimal(16,6)") / 1_000_000,
    )


def instant_to_ntz(col: Column | str) -> Column:
    """TIMESTAMP_LTZ instant -> the TIMESTAMP_NTZ holding its UTC wall
    clock. unix_micros on an instant is exact and tz-free."""
    c = F.col(col) if isinstance(col, str) else col
    return epoch_micros_to_ntz(F.unix_micros(c))


def event_time_micros(df: DataFrame, col: str = "ts") -> Column:
    """Micros-since-epoch for a timestamp column of either flavor
    (NTZ read as UTC wall clock, LTZ as the instant)."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return ntz_to_epoch_micros(col)
    return F.unix_micros(col)


# Public alias: the repo's one blessed floor-division path (callers
# bucketing epoch seconds into hours/days must not fork a weaker
# double-division variant).
exact_floor_div = _exact_floor_div


def event_time_seconds(df: DataFrame, col: str = "ts") -> Column:
    """Floor epoch-seconds for a timestamp column of either flavor.

    FLOOR division — the semantics of Spark's native timestamp ->
    long cast (Math.floorDiv), which this helper replaces. For
    post-epoch timestamps (all real event data) it is bit-identical
    to the DuckDB oracles' ``epoch_us(ts) // 1000000``; note DuckDB's
    integer ``//`` truncates toward zero, so the two diverge on
    PRE-epoch sub-second times only (floor(-0.5s) = -1 vs trunc = 0).
    """
    return _exact_floor_div(event_time_micros(df, col), 1_000_000)


def with_instant_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Replace an NTZ event-time column with the equivalent
    TIMESTAMP_LTZ instant (UTC interpretation) so watermarks and
    window/session_window state work; LTZ input passes through."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return df.withColumn(col, F.timestamp_micros(ntz_to_epoch_micros(col)))
    return df
