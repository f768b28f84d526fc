"""Decayed-trending invariants + a half-life unit check."""

from pyspark.sql import functions as F

from searchengine_spark.relational.trending import (
    HALF_LIFE_FAST_H,
    LAMBDA_FAST,
    decayed_weight,
    q_events_decayed_trending,
)


def test_half_life_weight_is_half(spark):
    df = spark.range(1).select(
        decayed_weight(F.lit(int(HALF_LIFE_FAST_H * 3600)), LAMBDA_FAST).alias("w"),
        decayed_weight(F.lit(0), LAMBDA_FAST).alias("w0"),
    )
    row = df.collect()[0]
    assert float(row["w0"]) == 1.0
    assert abs(float(row["w"]) - 0.5) < 1e-6


def test_fast_clock_decays_below_slow(spark, sf_dir):
    for r in q_events_decayed_trending(spark, sf_dir).collect():
        # Per-row fast weight <= slow weight (same age, shorter HL),
        # so the sums and the ratio inherit the bound.
        assert r["decayed_n_fast"] <= r["decayed_n_slow"] + 1e-6
        assert r["decayed_n_slow"] <= r["n_events"] + 1e-6
        assert 0.0 <= r["burst_ratio"] <= 1.0 + 1e-9
