"""One-pass distribution profiling: exact higher-moment aggregation.

stddev/skewness/kurtosis per group from INTEGER power sums: the value
column is cents-exact (2 decimals), so c = round(100*value) is an
exact int64 and sum(c), sum(c^2), sum(c^3), sum(c^4) are exact
integers — associative, order-independent, partial-aggregation
friendly. The float moments are then derived from the exact sums.
This is how you get bit-reproducible distribution stats on a
1000-executor cluster where float summation order is nondeterministic
(and it's why this does NOT use Spark's built-in skewness/kurtosis,
which fold in doubles and disagree across engines/partitionings).

c^4 reaches ~1e19 (> int64) for the largest values, and group sums go
far beyond — the 3rd/4th power sums ride in decimal(38,0) (Spark) /
HUGEINT (DuckDB), both exact integer arithmetic.

Population-moment formulas (k-th raw moment mk = S_k / (100^k n)):
var = m2 - m1^2; skew = (m3 - 3 m1 m2 + 2 m1^3) / var^1.5;
kurt = (m4 - 4 m1 m3 + 6 m1^2 m2 - 3 m1^4) / var^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table


def exact_moment_sums(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, n, s1..s4) with s2/s3/s4 in decimal(38,0) — re-aggregatable
    partials (sum them again to roll groups up). s2 rides in decimal
    too: c^2 ~ 1e14 over ~1e9-row groups exceeds int64, which would
    error under Spark 4 ANSI while DuckDB silently promotes to
    HUGEINT. Only s1 stays bigint (c ~ 1e7 x 1e9 rows ~ 1e16 < 2^63)."""
    c = F.round(F.col(value_col) * 100).cast("bigint")
    base = df.select(F.col(group_col), c.alias("c"))
    c2 = F.col("c") * F.col("c")
    c3 = c2 * F.col("c")
    return base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(c2.cast("decimal(38,0)")).alias("s2"),
        F.sum(c3.cast("decimal(38,0)")).alias("s3"),
        F.sum(
            (c2.cast("decimal(19,0)") * c2.cast("decimal(19,0)")).cast("decimal(38,0)")
        ).alias("s4"),
    )


def moments_from_sums(sums: DataFrame, group_col: str) -> DataFrame:
    """Derive (mean, stddev_pop, skewness, kurtosis) in double from
    the exact sums; identical FP dataflow to the DuckDB oracle."""
    n = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / F.lit(100.0) / n
    m2 = F.col("s2").cast("double") / F.lit(100.0**2) / n
    m3 = F.col("s3").cast("double") / F.lit(100.0**3) / n
    m4 = F.col("s4").cast("double") / F.lit(100.0**4) / n
    var = m2 - m1 * m1
    skew = (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1) / F.pow(var, 1.5)
    kurt = (
        m4
        - F.lit(4.0) * m1 * m3
        + F.lit(6.0) * m1 * m1 * m2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    ) / (var * var)
    return sums.select(
        group_col,
        "n",
        F.round(m1, 6).alias("mean_value"),
        F.round(F.sqrt(var), 6).alias("stddev_pop"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
    )


def q_event_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return moments_from_sums(
        exact_moment_sums(ev, "event_type", "value"), "event_type"
    )


def grouped_ols(
    df: DataFrame, group_col: str, x_col, y_cents
) -> DataFrame:
    """Per-group least-squares fit of y on x + Pearson r, from EXACT
    integer power sums (x integer-valued, y cents-exact) — the same
    bit-reproducibility argument as exact_moment_sums: the only
    floating-point happens once per GROUP at derivation, not once
    per row, so partition count and fold order can't change a digit.
    One shuffle, map-side partials, re-aggregatable.

    slope = (n Sxy - Sx Sy) / (n Sxx - Sx^2)
    r     = (n Sxy - Sx Sy) / sqrt((n Sxx - Sx^2)(n Syy - Sy^2))
    """
    x = x_col.cast("bigint")
    y = y_cents.cast("bigint")
    base = df.select(F.col(group_col), x.alias("x"), y.alias("y"))
    sums = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(
            (F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double") / F.lit(100.0)
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double") / F.lit(100.0)
    syy = F.col("syy").cast("double") / F.lit(100.0**2)
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = cov_n / varx_n
    intercept = (sy - slope * sx) / n
    r = cov_n / F.sqrt(varx_n * vary_n)
    return sums.select(
        group_col,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r, 6).alias("pearson_r"),
    )


def q_event_value_hour_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS of value against hour-of-day: does this event
    type's value drift across the day, and how tightly? (The grouped
    trend-fit every metrics pipeline wants, exact-partials edition.)"""
    ev = load_table(spark, sf_dir, "events")
    return grouped_ols(
        ev,
        "event_type",
        F.hour("ts"),
        F.round(F.col("value") * 100),
    )


QUERIES = {
    "events_value_moments": q_event_value_moments,
    "events_value_hour_regression": q_event_value_hour_regression,
}

ORACLES = {
    "events_value_hour_regression": """
        WITH base AS (
          SELECT event_type,
                 CAST(hour(ts) AS BIGINT) AS x,
                 CAST(round(value * 100) AS BIGINT) AS y
          FROM events
        ),
        sums AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(x * y) AS sxy,
                 SUM((y::HUGEINT) * y) AS syy
          FROM base GROUP BY event_type
        ),
        d AS (
          SELECT event_type, n,
                 n::DOUBLE AS nd,
                 sx::DOUBLE AS sxd,
                 sy::DOUBLE / 100.0 AS syd,
                 sxx::DOUBLE AS sxxd,
                 sxy::DOUBLE / 100.0 AS sxyd,
                 syy::DOUBLE / 10000.0 AS syyd
          FROM sums
        )
        SELECT event_type, n,
               round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
               round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd) / nd, 6) AS intercept,
               round((nd * sxyd - sxd * syd)
                     / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6) AS pearson_r
        FROM d
    """,
    "events_value_moments": """
        WITH c AS (
          SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
        ),
        sums AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 SUM(c) AS s1,
                 SUM(c * c) AS s2,
                 SUM((c::HUGEINT) * c * c) AS s3,
                 SUM((c::HUGEINT) * c * c * c) AS s4
          FROM c GROUP BY event_type
        ),
        m AS (
          -- explicit multiplications (not pow()) so the FP dataflow
          -- matches the Spark side op-for-op
          SELECT event_type, n,
                 s1::DOUBLE / 100.0 / n AS m1,
                 s2::DOUBLE / 10000.0 / n AS m2,
                 s3::DOUBLE / 1000000.0 / n AS m3,
                 s4::DOUBLE / 100000000.0 / n AS m4
          FROM sums
        )
        SELECT event_type,
               n,
               round(m1, 6) AS mean_value,
               round(sqrt(m2 - m1 * m1), 6) AS stddev_pop,
               round((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
                     / pow(m2 - m1 * m1, 1.5), 6) AS skewness,
               round((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2
                      - 3.0 * m1 * m1 * m1 * m1)
                     / ((m2 - m1 * m1) * (m2 - m1 * m1)), 6) AS kurtosis
        FROM m
    """,
}
