"""Int8 quantization: hand-computed vectors, error bounds, scale
invariance of the quantized search path."""

import pytest
from pyspark.sql import Row, functions as F

from searchengine_spark.operators.quantization import (
    INT8_MAX,
    q_int8_cosine_topk,
    quantize_int8,
)
from searchengine_spark.operators.similarity import cosine_topk, QUERY_VEC_ID, TOP_K


def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


def test_hand_quantized_values(spark):
    out = quantize_int8(_emb(spark, [(1, [1.0, -0.5, 0.27])])).collect()[0]
    assert out.scale == pytest.approx(1.0 / 127)
    # q = floor(x/scale + 0.5): 1.0 -> 127, -0.5 -> -63, 0.27 -> 34
    assert out.qvec == [127, -63, 34]


def test_zero_vector_guarded(spark):
    out = quantize_int8(_emb(spark, [(1, [0.0, 0.0])])).collect()[0]
    assert out.scale == 0.0
    assert out.qvec == [0, 0]


def test_error_bounded_by_half_step(spark, sf_dir):
    from searchengine_spark.operators.quantization import q_quantization_error

    rows = q_quantization_error(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # Reconstruction error can never exceed half a quantization
        # step (plus the round-9 display epsilon).
        assert r.max_abs_err <= r.scale / 2 + 1e-9
        assert r.cos_orig_deq > 0.999


def test_quantized_topk_close_to_exact(spark, sf_dir):
    from searchengine_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    exact = {r.vec_id for r in cosine_topk(
        emb.filter(F.col("vec_id") != QUERY_VEC_ID), qv
    ).collect()}
    quant = {r.vec_id for r in q_int8_cosine_topk(spark, sf_dir).collect()}
    # int8 with 64 dims preserves ranking almost perfectly.
    assert len(exact & quant) >= int(0.8 * TOP_K)


def test_scalar_quantizer_error_bound_property():
    """Hypothesis: for any vector, driver-side quantize (the exact
    twin of the Spark expression) reconstructs within scale/2 and
    never leaves the int8 range."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from searchengine_spark.operators.ann import quantize_query_vec

    floats = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )

    @given(st.lists(floats, min_size=1, max_size=64))
    @settings(max_examples=300, deadline=None)
    def check(vec):
        q = quantize_query_vec(vec)
        assert all(-127 <= x <= 127 for x in q)
        scale = max(abs(x) for x in vec) / 127.0
        if scale == 0:
            assert q == [0] * len(vec)
            return
        for x, qi in zip(vec, q):
            assert abs(x - qi * scale) <= scale / 2 + 1e-9 * abs(x)

    check()


def test_spark_quantizer_on_extreme_vectors(spark):
    """One Spark job over adversarial vectors: denormal-ish scales,
    all-negative, constant, single-element, zero."""
    rows = [
        (1, [1e-30, -1e-30, 0.0]),
        (2, [-5.0, -5.0, -5.0]),
        (3, [42.0]),
        (4, [0.0, 0.0]),
        (5, [1e6, -1e-6, 3.14159]),
    ]
    out = {r.vec_id: r for r in quantize_int8(_emb(spark, rows)).collect()}
    for vid, vec in rows:
        q, s = out[vid].qvec, out[vid].scale
        assert all(-127 <= x <= 127 for x in q)
        if s == 0:
            assert q == [0] * len(vec)
        else:
            for x, qi in zip(vec, q):
                assert abs(x - qi * s) <= s / 2 + 1e-9 * abs(x)
