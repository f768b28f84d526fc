"""JL projection: distance preservation (its entire purpose),
partitioning invariance, and sign-matrix balance."""

import numpy as np

from searchengine_spark.operators.projection import project, sign_matrix


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in X[i]], 0) for i in range(len(X))],
        "vec_id long, embedding array<float>, label int",
    )


def _projected(spark, X, out_dims=16):
    rows = project(_emb_df(spark, X), out_dims=out_dims).collect()
    P = np.zeros((len(X), out_dims))
    for r in rows:
        P[r["vec_id"], r["dim"]] = r["component"]
    return P


def test_distances_roughly_preserved(spark):
    # iid gaussian distances concentrate (all pairs ~equal), which
    # makes correlation meaningless — plant REAL structure: three
    # clusters at different separations, so distances span a range.
    rng = np.random.default_rng(12)
    centers = np.zeros((3, 64))
    centers[1, :8] = 3.0
    centers[2, :8] = 12.0
    X = np.concatenate(
        [c + rng.normal(scale=0.3, size=(12, 64)) for c in centers]
    ).astype(np.float32)
    P = _projected(spark, X) / np.sqrt(16)  # unbiased scaling
    orig, proj = [], []
    for i in range(len(X)):
        for j in range(i + 1, len(X)):
            orig.append(np.sum((X[i] - X[j]) ** 2))
            proj.append(np.sum((P[i] - P[j]) ** 2))
    orig, proj = np.array(orig), np.array(proj)
    assert np.corrcoef(orig, proj)[0, 1] > 0.9  # structure survives
    ratio = np.mean(proj / orig)
    assert 0.7 < ratio < 1.3  # unbiased on average


def test_partitioning_invariant(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(30, 64)).astype(np.float32)
    a = sorted(map(tuple, project(_emb_df(spark, X).coalesce(1)).collect()))
    b = sorted(map(tuple, project(_emb_df(spark, X).repartition(11)).collect()))
    assert a == b


def test_sign_matrix_balanced_and_deterministic(spark):
    m = sign_matrix(spark, 64, 16).collect()
    assert len(m) == 64 * 16
    signs = [r["sign"] for r in m]
    assert set(signs) == {-1, 1}
    frac_pos = sum(s == 1 for s in signs) / len(signs)
    assert 0.4 < frac_pos < 0.6
    m2 = sign_matrix(spark, 64, 16).collect()
    assert sorted(map(tuple, m)) == sorted(map(tuple, m2))
