"""Two-phase grouped top-k == window formulation, including the case
that breaks naive partials: a group's top rows spread across many
partitions."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from searchengine_spark.operators.topk import grouped_topk


def _window_topk(df, k):
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("g", "id", "v", F.col("rank").cast("int").alias("rank"))
    )


def test_matches_window_even_when_top_rows_span_partitions(spark):
    import random

    rng = random.Random(6)
    rows = [(f"g{i % 4}", float(rng.randint(0, 10_000)), i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    # many partitions: each group's top-k is guaranteed to be spread
    scattered = df.repartition(23)
    got = sorted(map(tuple, grouped_topk(scattered, "g", "v", "id", 5).collect()))
    want = sorted(map(tuple, _window_topk(df, 5).collect()))
    assert got == want
    assert len(got) == 4 * 5


def test_ties_break_on_id(spark):
    rows = [("a", 1.0, 3), ("a", 1.0, 1), ("a", 1.0, 2), ("a", 0.5, 0)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    got = [
        (r["id"], r["rank"])
        for r in grouped_topk(df.repartition(4), "g", "v", "id", 2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, 1), (2, 2)]


def test_groups_smaller_than_k_emit_all(spark):
    df = spark.createDataFrame(
        [("a", 2.0, 1), ("b", 1.0, 2)], "g string, v double, id long"
    )
    got = grouped_topk(df, "g", "v", "id", 10).collect()
    assert len(got) == 2
    assert all(r["rank"] == 1 for r in got)
