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
