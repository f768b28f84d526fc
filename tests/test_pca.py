"""Integer power iteration: numpy alignment on a spiked spectrum,
partitioning invariance (the exactness claim), overflow headroom."""

import numpy as np
import pytest

from searchengine_spark.operators.pca import (
    VSCALE,
    second_moment_matrix,
    top_direction,
)


def _emb_df(spark, X):
    rows = [(i, [float(v) for v in X[i]], 0) for i in range(len(X))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_aligns_with_numpy_on_spiked_data(spark):
    rng = np.random.default_rng(3)
    d, n = 16, 200
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    # spiked model: strong rank-1 component + small noise
    X = np.outer(rng.normal(size=n) * 3.0, u) + rng.normal(size=(n, d)) * 0.05
    X = X.astype(np.float32)
    df = _emb_df(spark, X)
    got = top_direction(second_moment_matrix(df), d).collect()
    v = np.zeros(d)
    for r in got:
        v[r["pos"]] = r["v"]
    v /= np.linalg.norm(v)
    S = (np.round(X.astype(np.float64) * 10000 + 0.5 - 0.5)).astype(np.int64)
    w, V = np.linalg.eigh(S.T @ S)
    top = V[:, -1]
    assert abs(float(np.dot(v, top))) > 0.99


def test_partitioning_invariance_bit_exact(spark):
    rng = np.random.default_rng(8)
    X = rng.normal(size=(120, 16)).astype(np.float32)
    df = _emb_df(spark, X)
    a = sorted(
        map(tuple, top_direction(second_moment_matrix(df.coalesce(1)), 16).collect())
    )
    b = sorted(
        map(
            tuple,
            top_direction(second_moment_matrix(df.repartition(13)), 16).collect(),
        )
    )
    assert a == b


def test_output_scale_bounded(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(50, 16)).astype(np.float32)
    got = top_direction(second_moment_matrix(_emb_df(spark, X)), 16).collect()
    assert len(got) == 16
    assert max(abs(r["v"]) for r in got) <= 2 * VSCALE  # renorm keeps int64 tiny
