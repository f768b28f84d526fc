"""Exact-moment aggregation: hand-checkable distributions, partial
re-aggregation property, and numpy cross-check."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.moments import (
    exact_moment_sums,
    moments_from_sums,
)


def _df(spark, values, group="g"):
    return spark.createDataFrame(
        [(group, float(v)) for v in values], "grp string, value double"
    )


def test_symmetric_distribution(spark):
    # Symmetric around 2.0: skewness exactly 0.
    out = moments_from_sums(
        exact_moment_sums(_df(spark, [1.0, 2.0, 3.0]), "grp", "value"), "grp"
    ).collect()[0]
    assert out.mean_value == 2.0
    assert out.stddev_pop == pytest.approx(np.sqrt(2.0 / 3.0), abs=1e-6)
    assert out.skewness == 0.0
    # kurtosis of {-1,0,1} (population) = (2/3) / (2/3)^2 = 1.5
    assert out.kurtosis == 1.5


def test_matches_numpy_moments(spark):
    rng = [round(x, 2) for x in np.random.RandomState(7).exponential(50, 500)]
    out = moments_from_sums(
        exact_moment_sums(_df(spark, rng), "grp", "value"), "grp"
    ).collect()[0]
    a = np.array(rng)
    m = a.mean()
    sd = a.std()
    skew = ((a - m) ** 3).mean() / sd**3
    kurt = ((a - m) ** 4).mean() / sd**4
    assert out.mean_value == pytest.approx(m, abs=1e-6)
    assert out.stddev_pop == pytest.approx(sd, abs=1e-6)
    assert out.skewness == pytest.approx(skew, abs=1e-4)
    assert out.kurtosis == pytest.approx(kurt, abs=1e-4)


def test_partial_sums_reaggregate(spark):
    """The power sums are associative partials: summing per-shard
    sums equals the global sums (the 1000-executor property)."""
    vals = [round(x, 2) for x in np.random.RandomState(3).uniform(0, 500, 200)]
    whole = exact_moment_sums(_df(spark, vals), "grp", "value").collect()[0]
    half_a = exact_moment_sums(_df(spark, vals[:100]), "grp", "value")
    half_b = exact_moment_sums(_df(spark, vals[100:]), "grp", "value")
    merged = (
        half_a.union(half_b)
        .groupBy("grp")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s1").alias("s1"),
            F.sum("s2").alias("s2"),
            F.sum("s3").alias("s3"),
            F.sum("s4").alias("s4"),
        )
        .collect()[0]
    )
    assert (whole.n, whole.s1, whole.s2, whole.s3, whole.s4) == (
        merged.n, merged.s1, merged.s2, merged.s3, merged.s4,
    )


def test_moment_sums_stream_equals_batch(spark, sf_dir):
    """Power sums are associative partials, so the same aggregation
    runs as a streaming complete-mode query and lands on identical
    exact integers."""
    from searchengine_spark.io import load_table
    from searchengine_spark.streaming.events import read_table_stream, run_to_memory

    stream = read_table_stream(spark, sf_dir, "events")
    run_to_memory(
        exact_moment_sums(stream, "event_type", "value"),
        "moments_mem",
        output_mode="complete",
    )
    got = {
        r.event_type: (r.n, r.s1, r.s2, r.s3, r.s4)
        for r in spark.table("moments_mem").collect()
    }
    want = {
        r.event_type: (r.n, r.s1, r.s2, r.s3, r.s4)
        for r in exact_moment_sums(
            load_table(spark, sf_dir, "events"), "event_type", "value"
        ).collect()
    }
    assert got == want


def test_grouped_ols_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from searchengine_spark.operators.moments import grouped_ols

    rng = np.random.default_rng(4)
    rows = []
    for g in ("a", "b"):
        for _ in range(200):
            x = int(rng.integers(0, 24))
            y = round(3.5 * x + float(rng.normal(0, 10)), 2)
            rows.append((g, x, y))
    df = spark.createDataFrame(rows, "g string, x int, y double")
    got = {
        r["g"]: (r["slope"], r["intercept"], r["pearson_r"])
        for r in grouped_ols(
            df, "g", F.col("x"), F.round(F.col("y") * 100)
        ).collect()
    }
    for g in ("a", "b"):
        xs = np.array([x for gg, x, _ in rows if gg == g], dtype=float)
        ys = np.array([round(y * 100) / 100 for gg, _, y in rows if gg == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert got[g][0] == pytest.approx(slope, abs=1e-5)
        assert got[g][1] == pytest.approx(intercept, abs=1e-5)
        assert got[g][2] == pytest.approx(r, abs=1e-6)


def test_grouped_ols_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from searchengine_spark.operators.moments import grouped_ols

    rows = [("a", i % 24, float(i % 97) + 0.25) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    one = grouped_ols(df.coalesce(1), "g", F.col("x"), F.round(F.col("y") * 100)).collect()
    many = grouped_ols(df.repartition(17), "g", F.col("x"), F.round(F.col("y") * 100)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
