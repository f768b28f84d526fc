"""Deterministic fixed-point k-means (operators/kmeans.py).

Oracle parity runs in test_oracle_parity via the registry; here we
pin the semantic invariants the hash compare can't express:
argmin correctness vs a brute-force recompute, empty-cluster
handling, rerun determinism, and the map-only assignment plan.
"""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.kmeans import (
    FP_SCALE,
    ITERS,
    K,
    assign_clusters,
    fixed_point_vec,
    kmeans_fit_assign,
)


def _quant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", fixed_point_vec("embedding").alias("qvec"))


def test_assignment_is_exact_argmin(spark, sf_dir):
    """Every row's (cluster, dist) equals a brute-force integer argmin
    against the same centroids — no float slack anywhere."""
    quant = _quant(spark, sf_dir)
    cents = [
        [int(v) for v in r["qvec"]]
        for r in quant.filter(F.col("vec_id") < K).orderBy("vec_id").collect()
    ]
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in assign_clusters(quant, cents).collect()
    }
    for r in quant.collect():
        dists = [
            (sum((a - b) * (a - b) for a, b in zip(r["qvec"], c)), j)
            for j, c in enumerate(cents)
        ]
        dist, cluster = min(dists)
        assert got[r["vec_id"]] == (cluster, dist)


def test_empty_cluster_keeps_previous_centroid(spark):
    """Identical vectors all tie-break into cluster 0; cluster 1 must
    survive the update rounds with its init centroid instead of
    crashing or collapsing to NULL."""
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = kmeans_fit_assign(emb, k=2, iters=2).collect()
    assert {r["cluster"] for r in out} == {0}
    assert all(r["dist"] == 0 for r in out)


def test_rerun_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans_fit_assign(emb).collect()))
    b = sorted(map(tuple, kmeans_fit_assign(emb).collect()))
    assert a == b


def test_fixed_point_bounds(spark, sf_dir):
    """|q| stays small enough that a 64-dim squared distance can never
    approach bigint overflow (the exactness argument in the module
    docstring)."""
    quant = _quant(spark, sf_dir)
    mx = quant.select(
        F.max(F.array_max(F.transform("qvec", lambda v: F.abs(v)))).alias("m")
    ).collect()[0]["m"]
    assert mx < 100 * FP_SCALE


def test_assignment_plan_is_map_only(spark, sf_dir):
    """Nearest-centroid assignment must be a pure map stage: literal
    centroids, no Exchange, no Join in the plan."""
    quant = _quant(spark, sf_dir)
    cents = [
        [int(v) for v in r["qvec"]]
        for r in quant.filter(F.col("vec_id") < K).orderBy("vec_id").collect()
    ]
    plan = (
        assign_clusters(quant, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_iters_reduce_total_distortion(spark, sf_dir):
    """Lloyd's monotonicity: total distortion after the full loop is
    <= distortion of the init assignment."""
    emb = load_table(spark, sf_dir, "embeddings")
    quant = _quant(spark, sf_dir)
    cents = [
        [int(v) for v in r["qvec"]]
        for r in quant.filter(F.col("vec_id") < K).orderBy("vec_id").collect()
    ]
    init_total = (
        assign_clusters(quant, cents)
        .agg(F.sum("dist").alias("s"))
        .collect()[0]["s"]
    )
    final_total = (
        kmeans_fit_assign(emb, iters=ITERS)
        .agg(F.sum("dist").alias("s"))
        .collect()[0]["s"]
    )
    assert final_total <= init_total


def test_adaptive_k_scales_with_data(spark):
    """Fixed K makes SemDeDup's within-cluster pair work quadratic in
    data size (the round-4 soak measured 47x at 5x data); the default
    k must grow once clusters would exceed TARGET_CLUSTER_SIZE."""
    import pyspark.sql.functions as F

    from searchengine_spark.operators.kmeans import (
        K,
        TARGET_CLUSTER_SIZE,
        kmeans_fit_assign,
    )

    n = TARGET_CLUSTER_SIZE * (K + 4)  # => adaptive k = K + 4
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"),
            (F.col("id") % 11).cast("float"),
            (F.col("id") % 13).cast("float"),
        ).alias("embedding"),
    )
    assigned = kmeans_fit_assign(emb)
    n_clusters = assigned.select("cluster").distinct().count()
    assert n_clusters > K  # more clusters than the fixed floor
    biggest = (
        assigned.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
    )
    # clusters need not be balanced, but the blow-up guard is that the
    # largest cluster stays data-bounded, not n-bounded
    assert biggest < n / 2


def test_testdata_scales_keep_k_eight(spark, sf_dir):
    """Every driver/testdata sf has <= 2000 vectors, so the adaptive
    default must still produce exactly K clusters there — otherwise
    the static DuckDB oracles (built with k=K) would diverge."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.kmeans import K, TARGET_CLUSTER_SIZE

    n = load_table(spark, sf_dir, "embeddings").count()
    assert max(K, n // TARGET_CLUSTER_SIZE) == K


def test_hier_assignment_near_exact_and_deterministic(spark):
    """Two-level assignment must (a) be deterministic under
    repartitioning, (b) produce distances that are valid (each row's
    dist equals the distance to its assigned centroid), and (c) stay
    close to the exact argmin in total distortion."""
    import pyspark.sql.functions as F

    from searchengine_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_hier,
        fixed_point_vec,
    )

    emb = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(
            ((F.col("id") * 37) % 101).cast("float"),
            ((F.col("id") * 17) % 89).cast("float"),
            ((F.col("id") * 7) % 53).cast("float"),
        ).alias("embedding"),
    )
    quant = emb.select("vec_id", fixed_point_vec("embedding").alias("qvec"))
    rows = quant.collect()
    cents = [list(r["qvec"]) for r in rows[:64]]  # k=64 > HIER_THRESHOLD

    hier = assign_clusters_hier(quant, cents)
    a = sorted(map(tuple, hier.select("vec_id", "cluster", "dist").collect()))
    b = sorted(
        map(
            tuple,
            assign_clusters_hier(quant.repartition(11), cents)
            .select("vec_id", "cluster", "dist")
            .collect(),
        )
    )
    assert a == b  # deterministic under layout

    # dist column is honest: recompute driver-side for a sample
    by_id = {r["vec_id"]: list(r["qvec"]) for r in rows}
    for vec_id, cluster, dist in a[:100]:
        v, c = by_id[vec_id], cents[cluster]
        assert dist == sum((x - y) * (x - y) for x, y in zip(v, c))

    exact = assign_clusters(quant, cents)
    total_hier = hier.agg(F.sum("dist")).collect()[0][0]
    total_exact = exact.agg(F.sum("dist")).collect()[0][0]
    assert total_exact <= total_hier <= 1.25 * total_exact


def test_train_sample_mod_sizing():
    """Modulus keeps ~target rows and degrades to 1 (no sampling) on
    small inputs — the knob the 100 TB story depends on."""
    from searchengine_spark.operators.kmeans import (
        TRAIN_SAMPLE_TARGET,
        train_sample_mod,
    )

    assert train_sample_mod(100) == 1          # n < target: full data
    assert train_sample_mod(500) == 2          # sf0.01 embeddings
    assert train_sample_mod(2000) == 8         # sf0.1 embeddings
    assert train_sample_mod(10**9) == 10**9 // TRAIN_SAMPLE_TARGET
    assert train_sample_mod(10**9, 10**5) == 10**4


def test_sample_target_scales_with_adaptive_k():
    """Per-cluster sample density is held as k grows past K: k<=K
    (every driver SF) keeps the oracle-checked target byte-identical;
    adaptive k (soak/production) scales it in TRAIN_SAMPLE_TARGET
    multiples so centroids don't underfit and skew the clustering
    (the round-10 soak regression: k=40 on a 250-row sample produced
    a 930-row max cluster, 1.75x the balanced pair work)."""
    from searchengine_spark.operators.kmeans import (
        K,
        TRAIN_SAMPLE_TARGET,
        _kmeans_ctes,
        scaled_sample_target,
    )

    assert scaled_sample_target(1) == TRAIN_SAMPLE_TARGET
    assert scaled_sample_target(K) == TRAIN_SAMPLE_TARGET
    assert scaled_sample_target(K + 1) == 2 * TRAIN_SAMPLE_TARGET
    assert scaled_sample_target(40) == 5 * TRAIN_SAMPLE_TARGET
    # >= ~30 rows per cluster at every k (the documented fit floor)
    for k in (8, 9, 40, 400, 10**5):
        assert scaled_sample_target(k) / k >= TRAIN_SAMPLE_TARGET / K
    # the DuckDB twin sizes its modulus from the SAME constant
    assert f"// {TRAIN_SAMPLE_TARGET})" in _kmeans_ctes(k=K)
    assert f"// {5 * TRAIN_SAMPLE_TARGET})" in _kmeans_ctes(k=40)


def test_training_reads_only_the_hash_sample(spark, sf_dir):
    """The iterated Lloyd passes must see ONLY sample rows: training
    with sample_target equal to the corpus (mod 1) and with the
    default (mod > 1 at every SF >= 0.01) gives different centroids,
    and the sampled run's final assignment still covers every row."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    full = kmeans_fit_assign(emb, sample_target=n)
    sampled = kmeans_fit_assign(emb)  # default target 250 -> mod 2 at sf0.01
    assert sampled.count() == n, "final assignment must cover the corpus"
    if n >= 500:
        diff = (
            full.alias("f")
            .join(sampled.alias("s"), "vec_id")
            .filter(F.col("f.dist") != F.col("s.dist"))
            .count()
        )
        assert diff > 0, (
            "sample-trained centroids should differ from full-trained "
            "ones — if not, training is still scanning the full corpus"
        )


def test_sample_membership_is_deterministic(spark, sf_dir):
    """Same record set regardless of partitioning (hash-based, not
    positional): the filter commutes with repartition."""
    from searchengine_spark.operators.kmeans import train_sample_filter

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(
        r["vec_id"]
        for r in emb.filter(train_sample_filter(4)).select("vec_id").collect()
    )
    b = sorted(
        r["vec_id"]
        for r in emb.repartition(13)
        .filter(train_sample_filter(4))
        .select("vec_id")
        .collect()
    )
    assert a == b and 0 < len(a) < emb.count()
