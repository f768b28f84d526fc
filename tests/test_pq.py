"""Product quantization: deterministic training, exact encode/ADC
arithmetic, and full hash parity with the unrolled-CTE DuckDB twin
(operators/pq.py — codes AND compressed-domain top-k are
hash-checkable, not invariant-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators import pq
from tests.helpers import assert_matches_oracle


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    codes, codebooks = pq.pq_train(load_table(spark, sf_dir, "embeddings"))
    return codes, codebooks


def test_codebook_shape_and_codes_range(trained):
    codes, codebooks = trained
    assert len(codebooks) == pq.M
    assert all(len(book) == pq.KPQ for book in codebooks)
    assert all(
        len(cvec) == pq.SUB_DIM for book in codebooks for cvec in book
    )
    stats = codes.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
        F.countDistinct("vec_id").alias("nv"),
    ).collect()[0]
    assert stats["n"] == stats["nv"] * pq.M  # one row per subspace
    assert 0 <= stats["lo"] and stats["hi"] < pq.KPQ


def test_training_is_deterministic(spark, sf_dir, trained):
    _, codebooks = trained
    _, again = pq.pq_train(load_table(spark, sf_dir, "embeddings"))
    assert codebooks == again


def test_adc_distance_is_exact_table_sum(spark, trained):
    """ADC distance of a vector against the query = sum over m of
    dt[m][code_m], recomputed by hand from the collected codes."""
    codes, codebooks = trained
    qsub = [codebooks[m][0] for m in range(pq.M)]  # any fixed query
    dt = pq.adc_distance_table(qsub, codebooks)
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq.pq_search(codes, dt, k=5).collect()
    }
    by_vec: dict[int, dict[int, int]] = {}
    for r in codes.select("vec_id", "m", "code").collect():
        by_vec.setdefault(r["vec_id"], {})[r["m"]] = r["code"]
    for vid, dist in got.items():
        assert dist == sum(
            dt[m][by_vec[vid][m]] for m in range(pq.M)
        )


def test_pq_codes_match_oracle(spark, sf_dir):
    assert_matches_oracle(
        pq.q_pq_codes(spark, sf_dir),
        pq.ORACLES["emb_pq_codes"],
        sf_dir,
        name="emb_pq_codes",
    )


def test_pq_adc_topk_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        pq.q_pq_adc_topk(spark, sf_dir),
        pq.ORACLES["emb_pq_adc_topk"],
        sf_dir,
        name="emb_pq_adc_topk",
    )


def test_adc_topk_plan_is_take_ordered(spark, sf_dir):
    plan = pq.q_pq_adc_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
