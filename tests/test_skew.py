"""Salted two-phase aggregation must equal the direct aggregation."""

from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.skew import salted_count_sum


def test_salted_agg_matches_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # event_type has only 5 distinct values — exactly the shape that
    # skews at scale.
    salted = {
        r.event_type: (r.n_rows, r.total)
        for r in salted_count_sum(ev, ["event_type"], "value").collect()
    }
    direct = {
        r.event_type: (r.n, float(r.t))
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("t"),
        )
        .collect()
    }
    assert salted == direct


def test_salt_actually_spreads(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_groups = (
        ev.withColumn(
            "_salt",
            F.xxhash64("event_type", F.monotonically_increasing_id()) % 16,
        )
        .groupBy("event_type", "_salt")
        .count()
        .count()
    )
    # 5 event types x up to 16 salts (xxhash64 % can be negative too,
    # widening the spread) — must exceed the unsalted 5 groups.
    assert n_groups > 20
