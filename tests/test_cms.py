"""Count-Min sketch (operators/cms.py): structural guarantees + exact
cross-engine hash of the estimates themselves."""

from pyspark.sql import functions as F

from searchengine_spark.operators import cms
from tests.helpers import assert_matches_oracle


def test_cms_one_sided_and_merge_associative(spark):
    words = spark.createDataFrame(
        [(w,) for w in ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"] * 1],
        ["word"],
    )
    sk = cms.cms_build(words).cache()
    truth = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_true"))
    est = cms.cms_estimate(sk, truth.select("word"))
    rows = {
        r["word"]: r
        for r in truth.join(est, "word").collect()
    }
    for w, r in rows.items():
        assert r["cms_est"] >= r["n_true"], w  # never undercounts
    # merging two shard sketches == sketching the whole stream
    a = words.filter(F.col("word").isin("a", "c"))
    b = words.filter(F.col("word").isin("b", "d"))
    merged = (
        cms.cms_build(a)
        .unionByName(cms.cms_build(b))
        .groupBy("ri", "cj")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk.collect())
    )
    sk.unpersist()


def test_cms_word_counts_matches_oracle_and_collides(spark, sf_dir):
    df = cms.q_cms_word_counts(spark, sf_dir).cache()
    agg = df.agg(
        F.sum((~F.col("over_ok")).cast("long")).alias("under"),
        F.sum((F.col("cms_est") > F.col("n_true")).cast("long")).alias("over"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["under"] == 0  # one-sided error is structural
    assert agg["over"] > 0  # W=16 < vocab: collisions really happen
    assert agg["n"] > agg["over"]  # min-over-rows recovers some words
    assert_matches_oracle(
        df, cms.ORACLES["approx_cms_word_counts"], sf_dir,
        name="approx_cms_word_counts",
    )
    df.unpersist()
