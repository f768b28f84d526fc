"""Bloom-filter join pruning: no false negatives, real pruning, exact
results, and the membership test stays a map-side codegen filter."""

from pyspark.sql import functions as F

from searchengine_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
    q_join_bloom_prefilter,
)
from tests.helpers import assert_matches_oracle


def test_no_false_negatives_and_bounded_false_positives(spark):
    dim = spark.range(0, 2_000).select(F.col("id").alias("k"))
    words, m_bits = bloom_build(dim, "k")
    # every dim key must pass its own filter
    assert bloom_prefilter(dim, "k", words, m_bits).count() == 2_000
    # disjoint probe keys: fpp ≈ 0.3% at 16 bits/key, assert ≤ 2%
    probe = spark.range(10_000, 40_000).select(F.col("id").alias("k"))
    fp = bloom_prefilter(probe, "k", words, m_bits).count()
    assert fp <= 600, fp


def test_prefilter_prunes_fact_rows(spark, sf_dir):
    from searchengine_spark.io import load_table

    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .select("o_orderkey")
    )
    words, m_bits = bloom_build(dim, "o_orderkey")
    fact = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    total = fact.count()
    kept = bloom_prefilter(fact, "l_orderkey", words, m_bits).count()
    exact = fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"]).count()
    # sandwich: everything the join keeps survives; pruning is real
    assert exact <= kept < total / 2


def test_membership_test_is_map_side(spark, sf_dir):
    plan = q_join_bloom_prefilter(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "shiftleft" in plan  # the bit test is in-plan Column arithmetic
    assert "pythonUDF" not in plan.lower()


def test_matches_oracle(spark, sf_dir):
    from searchengine_spark.operators.bloom import _BLOOM_SQL

    assert_matches_oracle(
        q_join_bloom_prefilter(spark, sf_dir), _BLOOM_SQL, sf_dir, "join_bloom_prefilter"
    )


def test_bloom_prefilter_reserved_column_clash_raises(spark):
    """Round-7 ADVICE fix: a fact frame already carrying _bfarr (or a
    _bfp position column) must fail loudly, not yield ambiguous
    columns or silently-replaced data."""
    import pytest
    from pyspark.sql import functions as F

    from searchengine_spark.operators.bloom import bloom_build, bloom_prefilter

    dim = spark.range(10).select(F.col("id").alias("k"))
    words, m_bits = bloom_build(dim, "k")
    fact = spark.range(5).select(
        F.col("id").alias("k"), F.lit(None).cast("array<bigint>").alias("_bfarr")
    )
    with pytest.raises(ValueError, match="reserve"):
        bloom_prefilter(fact, "k", words, m_bits)
