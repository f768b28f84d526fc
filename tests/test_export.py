"""Sharded export: exact shard sizes, deterministic order under any
input partitioning, one file per shard on disk."""

import glob
import os

from pyspark.sql import functions as F

from searchengine_spark.operators.export import (
    global_shuffle_index,
    shard_assignments,
    write_shards,
)


def test_global_index_is_a_permutation_and_partitioning_invariant(spark):
    df = spark.range(0, 300).select(F.col("id").alias("k"))
    idx1 = {r["k"]: r["gidx"] for r in global_shuffle_index(df, "k").collect()}
    assert sorted(idx1.values()) == list(range(300))  # exact permutation
    # same assignment whatever the input partitioning
    idx2 = {
        r["k"]: r["gidx"]
        for r in global_shuffle_index(df.repartition(13), "k").collect()
    }
    assert idx1 == idx2
    # hash order, not scan order: ids must not map to themselves
    assert any(idx1[k] != k for k in idx1)


def test_shard_sizes_exact_except_last(spark):
    df = spark.range(0, 300).select(F.col("id").alias("k"))
    sizes = (
        shard_assignments(df, "k", rows_per_shard=64)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("shard")
        .collect()
    )
    assert [r["n"] for r in sizes] == [64, 64, 64, 64, 44]


def test_write_shards_one_file_each_and_manifest(spark, tmp_path):
    df = spark.range(0, 200).select(F.col("id").alias("k"))
    out = os.path.join(tmp_path, "shards")
    manifest = write_shards(df, out, "k", rows_per_shard=64)
    assert manifest == {0: 64, 1: 64, 2: 64, 3: 8}
    for shard, n in manifest.items():
        files = glob.glob(os.path.join(out, f"shard={shard}", "*.parquet"))
        assert len(files) == 1  # the shard fits one task by construction
        assert spark.read.parquet(files[0]).count() == n


def test_byte_budget_shards_contract(spark, sf_dir):
    """Greedy byte packing: shard byte sums stay within budget + one
    document, shards are contiguous in the shuffled order, and the
    assignment hash-matches the running-sum oracle."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators import export as E
    from tests.helpers import assert_matches_oracle

    df = E.q_export_byte_budget_shards(spark, sf_dir).cache()
    budget = E.SHARD_BYTE_BUDGET
    max_doc = df.agg(F.max("n_bytes")).collect()[0][0]
    per_shard = df.groupBy("shard_id").agg(F.sum("n_bytes").alias("s"))
    n_shards = per_shard.count()
    assert n_shards > 1  # packing actually splits the corpus
    # every shard fits budget + at most one straddling document
    assert per_shard.filter(F.col("s") > budget + max_doc).count() == 0
    # all but the last shard are FULL past the budget line minus one doc
    assert (
        per_shard.filter(F.col("s") < budget - max_doc).count() <= 1
    )
    assert_matches_oracle(
        df,
        E.ORACLES["export_byte_budget_shards"],
        sf_dir,
        name="export_byte_budget_shards",
    )
    df.unpersist()


def test_integrity_manifest_detects_corruption(spark, tmp_path):
    """The whole point: a changed document flips exactly its shard's
    checksum; counts/chars stay the same when lengths match."""
    import pandas as pd

    from searchengine_spark.operators.export import (
        q_export_shard_integrity_manifest,
    )

    def write(texts, d):
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        return {
            r["shard"]: r
            for r in q_export_shard_integrity_manifest(spark, str(d)).collect()
        }

    texts = [f"document number {i} body" for i in range(100)]
    a = write(texts, tmp_path / "a")
    corrupted = list(texts)
    corrupted[7] = "document numbor 7 body"  # same length, one byte off
    b = write(corrupted, tmp_path / "b")
    assert set(a) == set(b)
    diff = [s for s in a if a[s]["checksum"] != b[s]["checksum"]]
    assert len(diff) == 1  # exactly the shard holding doc 7
    same = [s for s in a if s not in diff]
    assert all(
        a[s]["checksum"] == b[s]["checksum"]
        and a[s]["total_chars"] == b[s]["total_chars"]
        for s in same
    )


def test_integrity_manifest_order_independent(spark, sf_dir):
    from pyspark.sql import functions as F

    from searchengine_spark.operators.export import (
        q_export_shard_integrity_manifest,
    )

    a = {
        r["shard"]: (r["n_docs"], r["total_chars"], r["checksum"])
        for r in q_export_shard_integrity_manifest(spark, sf_dir).collect()
    }
    assert sum(n for n, _, _ in a.values()) > 0
    # recompute under a different partitioning: identical manifest
    b = {
        r["shard"]: (r["n_docs"], r["total_chars"], r["checksum"])
        for r in q_export_shard_integrity_manifest(spark, sf_dir)
        .repartition(7)
        .collect()
    }
    assert a == b


def test_rebalance_rendezvous_moves_only_to_the_new_shard(spark, sf_dir):
    # defining property of rendezvous hashing: on n -> n+1, a row
    # moves IFF the new slot's weight beats its previous max — so
    # every moved row lands on the NEW shard
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.export import (
        REBAL_FROM,
        REBAL_TO,
        _rdv_shard,
        q_export_rebalance_audit,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    placed = docs.select(
        _rdv_shard(F.col("doc_id"), REBAL_FROM).alias("a"),
        _rdv_shard(F.col("doc_id"), REBAL_TO).alias("b"),
    )
    moved = placed.filter(F.col("a") != F.col("b"))
    assert moved.filter(F.col("b") != REBAL_TO - 1).count() == 0

    out = {r.scheme: r for r in q_export_rebalance_audit(spark, sf_dir).collect()}
    # theory bands: mod ~ n/(n+1) = 0.889, rendezvous ~ 1/(n+1) = 0.111
    assert out["mod"].moved_frac > 0.75
    assert 0.05 < out["rendezvous"].moved_frac < 0.2
    assert out["rendezvous"].n_moved < out["mod"].n_moved
