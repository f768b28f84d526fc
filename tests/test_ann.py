"""ANN LSH: determinism, bucket behavior, and recall vs brute force."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.ann import ann_search, build_ann_index
from searchengine_spark.operators.similarity import cosine_topk

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").cache()
    yield df
    # Unpersist so later tests asserting on parquet-scan plans don't
    # see an InMemoryTableScan for this table instead.
    df.unpersist()


def test_bucket_deterministic(emb):
    idx1 = build_ann_index(emb, dim=DIM).orderBy("vec_id").collect()
    idx2 = build_ann_index(emb, dim=DIM).orderBy("vec_id").collect()
    assert [r.bucket for r in idx1] == [r.bucket for r in idx2]
    # buckets spread across the space, not collapsed into one
    assert len({r.bucket for r in idx1}) > 10


def test_query_finds_itself(emb, spark):
    idx = build_ann_index(emb, dim=DIM)
    qv = emb.filter(F.col("vec_id") == 7).select("embedding")
    res = ann_search(idx, qv, dim=DIM, k=5, probe_hamming=0).collect()
    # identical vector -> same bucket, cosine 1.0, rank 1
    assert res[0].vec_id == 7
    assert res[0].cosine == pytest.approx(1.0)


def test_embedding_neardup_finds_planted_duplicates(spark, emb):
    from searchengine_spark.operators.ann import embedding_neardup_pairs

    # Plant a near-duplicate of vec 5: tiny perturbation of one component.
    base = emb.filter(F.col("vec_id") == 5).collect()[0]
    near = list(base.embedding)
    near[0] = float(near[0]) + 1e-4
    extra = spark.createDataFrame(
        [(9001, near, base.label)], "vec_id bigint, embedding array<float>, label int"
    )
    pairs = embedding_neardup_pairs(
        emb.unionByName(extra), dim=DIM, threshold=0.999
    ).collect()
    assert {(p.id_a, p.id_b) for p in pairs} >= {(5, 9001)}
    planted = [p for p in pairs if (p.id_a, p.id_b) == (5, 9001)][0]
    assert planted.cosine >= 0.999


def test_ivf_recall_beats_probe_fraction(emb):
    from searchengine_spark.operators.ann import build_ivf_index, ivf_search

    assigned, centroids = build_ivf_index(emb, n_centroids=16)
    assigned = assigned.cache()
    qv = emb.filter(F.col("vec_id") == 3).select("embedding")
    exact = {
        r.vec_id
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 3),
            emb.filter(F.col("vec_id") == 3).select(F.col("embedding").alias("qvec")),
            k=10,
        ).collect()
    }
    res = ivf_search(assigned, centroids, qv, k=11, n_probe=4).collect()
    approx = {r.vec_id for r in res if r.vec_id != 3}
    recall = len(exact & approx) / 10
    # probing 4/16 centroids must recover far more than 25% of the
    # true neighbors (that's the point of IVF).
    assert recall >= 0.5, f"recall {recall}"
    # self-match present and perfect when probing its own bucket
    assert any(r.vec_id == 3 and r.cosine == pytest.approx(1.0) for r in res)


def test_recall_vs_bruteforce(emb):
    qv = emb.filter(F.col("vec_id") == 3).select(
        F.col("embedding").alias("qvec"), F.col("embedding")
    )
    exact = {
        r.vec_id
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 3), qv.select("qvec"), k=10
        ).collect()
    }
    idx = build_ann_index(emb.filter(F.col("vec_id") != 3), dim=DIM)
    approx = {
        r.vec_id
        for r in ann_search(
            idx, qv.select("embedding"), dim=DIM, k=10, probe_hamming=4
        ).collect()
    }
    recall = len(exact & approx) / 10
    # Multi-probe at hamming<=4 over 12 planes must recover a
    # meaningful fraction of the true top-10 on random data.
    assert recall >= 0.3, f"recall {recall}"


def test_ivf_persisted_search_prunes_partitions(emb, spark):
    """Persisted IVF index: probe query must (a) match the in-memory
    probe path, and (b) scan only the probed centroid partitions —
    PartitionFilters in the plan, PartitionCount == n_probe."""
    import shutil
    import tempfile

    from searchengine_spark.operators.ann import (
        build_ivf_index,
        ivf_search_pruned,
        query_probe_ids,
        read_ivf_index,
        write_ivf_index,
    )

    assigned, centroids = build_ivf_index(emb, n_centroids=16)
    out = tempfile.mkdtemp(prefix="se_ivf_")
    try:
        write_ivf_index(assigned, out)
        disk = read_ivf_index(spark, out)
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]

        res = ivf_search_pruned(disk, centroids, qvec, k=10, n_probe=4)
        got = [(r.vec_id, r.cosine) for r in res.collect()]
        mem = [
            (r.vec_id, r.cosine)
            for r in ivf_search_pruned(assigned, centroids, qvec, k=10, n_probe=4).collect()
        ]
        assert got == mem
        assert got[0][0] == 3 and got[0][1] == pytest.approx(1.0)

        probes = query_probe_ids(centroids, qvec, 4)
        assert len(set(probes)) == 4
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [centroid_id" in plan, plan

        # Behavioral proof of pruning: corrupt a NON-probed partition;
        # the pruned search must still succeed (it never opens that
        # file), while touching the corrupted partition must fail.
        import os

        victim = next(c for c in range(16) if c not in probes)
        with open(os.path.join(out, f"centroid_id={victim}", "part-corrupt.parquet"), "wb") as fh:
            fh.write(b"not a parquet file")
        fresh = read_ivf_index(spark, out)
        again = [
            (r.vec_id, r.cosine)
            for r in ivf_search_pruned(fresh, centroids, qvec, k=10, n_probe=4).collect()
        ]
        assert again == got
        with pytest.raises(Exception):
            fresh.filter(F.col("centroid_id") == victim).collect()
        # serving plan is scan -> project -> topk: no join, no exchange
        # besides the top-k singlePartition gather
        assert "Join" not in plan, plan
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_ivf_int8_index_matches_float_ranking(emb, spark):
    """int8-quantized persisted IVF: same probe pruning, near-identical
    ranking (64-dim int8 cosine), 4x smaller storage."""
    import shutil
    import tempfile

    from searchengine_spark.operators.ann import (
        build_ivf_index,
        ivf_search_pruned,
        ivf_search_pruned_int8,
        write_ivf_index,
        write_ivf_index_int8,
    )

    assigned, centroids = build_ivf_index(emb, n_centroids=16)
    out_f = tempfile.mkdtemp(prefix="se_ivf_f_")
    out_q = tempfile.mkdtemp(prefix="se_ivf_q_")
    try:
        write_ivf_index(assigned, out_f)
        write_ivf_index_int8(assigned, out_q)
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
        ]
        exact = [
            r.vec_id
            for r in ivf_search_pruned(
                spark.read.parquet(out_f), centroids, qvec, k=10, n_probe=4
            ).collect()
        ]
        quant = ivf_search_pruned_int8(
            spark.read.parquet(out_q), centroids, qvec, k=10, n_probe=4
        )
        plan = quant._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        qids = [r.vec_id for r in quant.collect()]
        # the planted self-match survives quantization at rank 1
        assert qids[0] == 3
        assert len(set(exact) & set(qids)) >= 8
        # int8 shards really are smaller on disk
        import os

        size = lambda d: sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )
        assert size(out_q) < size(out_f)
    finally:
        shutil.rmtree(out_f, ignore_errors=True)
        shutil.rmtree(out_q, ignore_errors=True)


def test_hard_negative_mine_excludes_dups_and_ranks(spark):
    from searchengine_spark.operators.ann import hard_negative_mine

    # 4-dim toy space, 2 planes: base vector, a near-identical dup
    # (cos ~ 1 -> excluded), and two progressively-rotated neighbors
    base = [1.0, 0.0, 0.2, 0.1]
    dup = [1.0, 0.001, 0.2, 0.1]
    near = [0.9, 0.3, 0.2, 0.1]
    far = [0.5, 0.7, 0.2, 0.1]
    emb = spark.createDataFrame(
        [(0, base), (1, dup), (2, near), (3, far)],
        "vec_id long, embedding array<double>",
    )
    got = hard_negative_mine(emb, dim=4, k=2, dup_threshold=0.999, n_planes=2)
    rows = {
        (r["anchor_id"], r["neg_rank"]): r["neg_id"] for r in got.collect()
    }
    # anchor 0: dup (vec 1) is excluded; best negative is the near
    # neighbor, then the far one (if bucket-shared)
    assert rows.get((0, 1)) == 2
    assert 1 not in [v for (a, _), v in rows.items() if a == 0]


def test_hard_negatives_query_matches_oracle(spark, sf_dir):
    from searchengine_spark.operators.ann import ORACLES, q_hard_negatives
    from tests.helpers import assert_matches_oracle

    assert_matches_oracle(
        q_hard_negatives(spark, sf_dir),
        ORACLES["emb_hard_negatives"],
        sf_dir,
        "emb_hard_negatives",
    )


def test_mutual_nn_collapses_identical_triple_to_one_link(spark):
    # three identical vectors + one identical pair elsewhere: the
    # triple's NN graph is a star on the smallest id (tie-break), so
    # exactly ONE mutual link survives; the pair is mutual by
    # construction
    from searchengine_spark.operators.ann import mutual_nn_pairs

    rows = [
        (0, [1.0, 2.0, 3.0, 4.0], 0),
        (1, [1.0, 2.0, 3.0, 4.0], 0),
        (2, [1.0, 2.0, 3.0, 4.0], 0),
        (3, [-4.0, 3.0, -2.0, 1.0], 1),
        (4, [-4.0, 3.0, -2.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in mutual_nn_pairs(emb, dim=4).collect()
    }
    assert set(out) == {(0, 1), (3, 4)}
    assert out[(0, 1)] == 1.0 and out[(3, 4)] == 1.0


def test_label_silhouette_separates_planted_clusters(spark, tmp_path_factory):
    import os

    from searchengine_spark.operators.similarity import QUERIES

    # two tight, orthogonal clusters + one mislabeled vector: the
    # clean label scores ~1, the label carrying the mislabel reports
    # exactly one negative-s vector
    rows = []
    for i in range(10):
        rows.append((i, [10.0 + (i % 3) * 0.01, 0.1, 0.0, 0.0], 0))
    for i in range(10, 20):
        rows.append((i, [0.1, 10.0 + (i % 3) * 0.01, 0.0, 0.0], 1))
    # vec 20 labeled 0 but sits in cluster 1
    rows.append((20, [0.1, 10.0, 0.0, 0.0], 0))
    d = str(tmp_path_factory.mktemp("sil"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    out = {r.label: r for r in QUERIES["emb_label_silhouette"](spark, d).collect()}
    assert out[1].n_negative == 0
    assert out[1].mean_silhouette > 0.9
    assert out[0].n_negative == 1  # exactly the planted mislabel
    assert out[0].n_vectors == 11
