"""Heavy hitters: exactness vs brute force, sketch no-miss guarantee
under forced decrements, guard rails."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.heavy_hitters import heavy_hitters


def _words(spark, words):
    return spark.createDataFrame([(w,) for w in words], "word string")


def test_exact_vs_bruteforce(spark):
    # 1000 words: "hot" 100x (10%), "warm" 30x (3%), tail of uniques.
    stream = ["hot"] * 100 + ["warm"] * 30 + [f"u{i:04d}" for i in range(870)]
    df = _words(spark, stream)
    got = {
        r.word: (r.n_occurrences, r.frac)
        for r in heavy_hitters(df, theta=0.02, capacity=100).collect()
    }
    brute = {
        r.word: r["count"]
        for r in df.groupBy("word").count().filter(F.col("count") >= 20).collect()
    }
    assert set(got) == set(brute)
    assert got["hot"] == (100, 0.1)
    assert got["warm"] == (30, 0.03)


def test_sketch_survives_forced_decrements(spark):
    """Capacity far below cardinality: decrements fire constantly,
    the true heavy item must still be found (the MG guarantee)."""
    stream = []
    for i in range(500):
        stream.append("needle")
        stream.append(f"hay{i}")  # 500 distinct one-off words
    df = _words(spark, stream).repartition(4)
    got = [r.word for r in heavy_hitters(df, theta=0.25, capacity=8).collect()]
    assert got == ["needle"]


def test_capacity_guard(spark):
    with pytest.raises(ValueError):
        heavy_hitters(_words(spark, ["a"]), theta=0.01, capacity=50)
