"""Deterministic sampling/splitting: stability properties that
df.sample() does NOT have (and the pipeline relies on)."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.sampling import (
    deterministic_sample,
    train_val_test_split,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_sample_stable_under_repartition(docs):
    base = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    repart = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(7), "doc_id", 0.2)
        .select("doc_id")
        .collect()
    }
    assert base == repart
    n = docs.count()
    assert 0.1 * n < len(base) < 0.3 * n


def test_sample_stable_under_append(docs):
    """Old records keep their assignment when new data arrives."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_sample = {
        r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).select("doc_id").collect()
    }
    half_sample = {
        r.doc_id for r in deterministic_sample(half, "doc_id", 0.2).select("doc_id").collect()
    }
    assert half_sample == {d for d in full_sample if d % 2 == 0}


def test_split_partitions_everything_once(docs):
    split = train_val_test_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    n = docs.count()
    assert counts["train"] > 0.7 * n
    assert 0.03 * n < counts.get("val", 0) < 0.2 * n
    assert 0.03 * n < counts.get("test", 0) < 0.2 * n


def test_split_salt_gives_independent_assignment(docs):
    a = train_val_test_split(docs, "doc_id", salt="a")
    b = train_val_test_split(docs, "doc_id", salt="b")
    joined = a.select("doc_id", F.col("split").alias("sa")).join(
        b.select("doc_id", F.col("split").alias("sb")), "doc_id"
    )
    agree = joined.filter(F.col("sa") == F.col("sb")).count() / joined.count()
    # independent assignments agree ~ sum(p_i^2) = .66; identical
    # ones agree 1.0 — assert we're nowhere near identical
    assert agree < 0.9


def test_quota_caps_every_group_and_is_partition_stable(docs):
    from searchengine_spark.operators.sampling import sample_per_group_quota

    src = docs.withColumn("source", (F.col("doc_id") % 3).cast("string"))
    picked = sample_per_group_quota(src, "source", "doc_id", 5)
    per_group = {
        r["source"]: r["n"]
        for r in picked.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n <= 5 for n in per_group.values())
    # repartitioning must not change which records survive
    again = sample_per_group_quota(src.repartition(13), "source", "doc_id", 5)
    assert {r.doc_id for r in picked.select("doc_id").collect()} == {
        r.doc_id for r in again.select("doc_id").collect()
    }


def test_quota_smaller_groups_pass_through(spark):
    from searchengine_spark.operators.sampling import sample_per_group_quota

    df = spark.createDataFrame(
        [(i, "only") for i in range(3)], "doc_id long, source string"
    )
    assert sample_per_group_quota(df, "source", "doc_id", 10).count() == 3


class TestWeightedPPS:
    def _toy(self, spark, n_rows=50, seed=3):
        import random

        rng = random.Random(seed)
        rows = [(i, rng.randint(1, 40)) for i in range(n_rows)]
        return rows, spark.createDataFrame(rows, "doc_id long, n_chars int")

    def test_exact_selection_count_and_brute_force_match(self, spark):
        from searchengine_spark.operators.sampling import (
            hash_bucket,
            weighted_pps_sample,
        )

        rows, df = self._toy(spark)
        n = 10
        got = {
            r["doc_id"]: (r["weight"], r["n_hits"])
            for r in weighted_pps_sample(df, "doc_id", "n_chars", n).collect()
        }
        # brute force: same traversal order (bucket, id), same g()
        buckets = {
            r["doc_id"]: r["b"]
            for r in df.select(
                "doc_id", hash_bucket(F.col("doc_id"), salt="pps").alias("b")
            ).collect()
        }
        ordered = sorted(rows, key=lambda r: (buckets[r[0]], r[0]))
        W = sum(w for _, w in ordered)
        g = lambda c: (2 * n * c + W) // (2 * W)
        expect, c = {}, 0
        for i, w in ordered:
            hits = g(c + w) - g(c)
            if hits > 0:
                expect[i] = (w, hits)
            c += w
        assert got == expect
        assert sum(h for _, h in got.values()) == n  # exactly n points

    def test_partitioning_invariance(self, spark):
        from searchengine_spark.operators.sampling import weighted_pps_sample

        _, df = self._toy(spark, n_rows=80, seed=9)
        a = sorted(
            map(tuple, weighted_pps_sample(df, "doc_id", "n_chars", 17).collect())
        )
        b = sorted(
            map(
                tuple,
                weighted_pps_sample(
                    df.repartition(13), "doc_id", "n_chars", 17
                ).collect(),
            )
        )
        assert a == b

    def test_heavy_row_always_included_with_multiplicity(self, spark):
        from searchengine_spark.operators.sampling import weighted_pps_sample

        # one row carries ~91% of the weight: with n=10 it must take
        # several selection points; every selected row reports >= 1.
        rows = [(i, 1) for i in range(9)] + [(99, 100)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars int")
        got = {r["doc_id"]: r["n_hits"] for r in weighted_pps_sample(
            df, "doc_id", "n_chars", 10
        ).collect()}
        assert got[99] >= 8
        assert sum(got.values()) == 10

    def test_nonpositive_weights_excluded(self, spark):
        from searchengine_spark.operators.sampling import weighted_pps_sample

        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, -4), (4, None), (5, 7)],
            "doc_id long, n_chars int",
        )
        got = weighted_pps_sample(df, "doc_id", "n_chars", 2).collect()
        assert {r["doc_id"] for r in got} <= {1, 5}
        assert sum(r["n_hits"] for r in got) == 2


def test_leakage_safe_split_keeps_clusters_together(spark):
    from pyspark.sql import functions as F

    from searchengine_spark.operators.sampling import leakage_safe_split

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    # clusters: {0..9} -> 0, {10..14} -> 10; rest singleton
    comps = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(i, 10) for i in range(10, 15)],
        "doc_id long, component long",
    )
    out = leakage_safe_split(docs, comps).collect()
    assert len(out) == 200  # full coverage incl. singletons
    by_doc = {r["doc_id"]: r["split"] for r in out}
    assert len({by_doc[i] for i in range(10)}) == 1   # cluster 0 together
    assert len({by_doc[i] for i in range(10, 15)}) == 1
    assert len(set(by_doc.values())) == 3  # all three splits occur
