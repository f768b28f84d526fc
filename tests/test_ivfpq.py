"""IVF-PQ (operators/ivfpq.py): coarse cells + residual PQ + probed
ADC search, hash-checked end to end against the unrolled SQL twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators import ivfpq, pq
from tests.helpers import assert_matches_oracle


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    return ivfpq.ivfpq_train(load_table(spark, sf_dir, "embeddings"))


def test_codes_carry_cell_and_code(trained):
    codes, cents, codebooks = trained
    assert len(cents) > 0 and len(codebooks) == pq.M
    row = codes.agg(
        F.countDistinct("vec_id").alias("nv"),
        F.count(F.lit(1)).alias("n"),
        F.min("cluster").alias("clo"),
        F.max("cluster").alias("chi"),
        F.max("code").alias("codehi"),
    ).collect()[0]
    assert row["n"] == row["nv"] * pq.M
    assert 0 <= row["clo"] and row["chi"] < len(cents)
    assert row["codehi"] < pq.KPQ


def test_residual_quantization_beats_raw_pq_distortion(spark, sf_dir, trained):
    """The point of encoding residuals: total quantization distortion
    (sum of per-subspace assignment dists) must not exceed raw PQ's
    on the same data — residuals have lower variance."""
    _, cents, cbs_r = trained
    emb = load_table(spark, sf_dir, "embeddings")
    raw_codes, _ = pq.pq_train(emb)

    quant = emb.select(
        F.col("vec_id"), pq.fixed_point_vec("embedding").alias("qvec")
    )
    res_d = (
        ivfpq._assign_codes(ivfpq.residual_subs(quant, cents), cbs_r)
        .agg(F.sum("dist"))
        .collect()[0][0]
    )
    raw_d = raw_codes.agg(F.sum("dist")).collect()[0][0]
    assert res_d <= raw_d


def test_probed_search_is_subset_of_cells(trained, spark, sf_dir):
    codes, cents, codebooks = trained
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        int(v)
        for v in emb.filter(F.col("vec_id") == pq.PQ_QUERY_ID)
        .select(pq.fixed_point_vec("embedding").alias("qv"))
        .collect()[0]["qv"]
    ]
    hits = ivfpq.ivfpq_search(
        codes, cents, codebooks, qv, exclude_id=pq.PQ_QUERY_ID
    )
    got = hits.join(
        codes.select("vec_id", "cluster").distinct(), "vec_id"
    ).select("cluster").distinct()
    assert got.count() <= ivfpq.N_PROBE


def test_persisted_codes_prune_partitions(trained, spark, sf_dir):
    """Cell-partitioned codes layout: the probe search must (a) match
    the in-memory path and (b) scan only the probed cell directories
    — PartitionFilters in the plan, and a corrupted NON-probed
    partition is never opened."""
    import os
    import shutil
    import tempfile

    codes, cents, codebooks = trained
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        int(v)
        for v in emb.filter(F.col("vec_id") == pq.PQ_QUERY_ID)
        .select(pq.fixed_point_vec("embedding").alias("qv"))
        .collect()[0]["qv"]
    ]
    out = tempfile.mkdtemp(prefix="se_ivfpq_")
    try:
        ivfpq.write_ivfpq_index(codes, out)
        disk = ivfpq.read_ivfpq_index(spark, out)
        res = ivfpq.ivfpq_search(
            disk, cents, codebooks, qv, exclude_id=pq.PQ_QUERY_ID
        )
        got = [(r.vec_id, r.adc_dist) for r in res.collect()]
        mem = [
            (r.vec_id, r.adc_dist)
            for r in ivfpq.ivfpq_search(
                codes, cents, codebooks, qv, exclude_id=pq.PQ_QUERY_ID
            ).collect()
        ]
        assert got == mem and len(got) == pq.PQ_K

        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [cluster" in plan, plan

        dim = len(qv)
        probed = {
            j
            for _, j in sorted(
                (sum((qv[i] - c[i]) ** 2 for i in range(dim)), j)
                for j, c in enumerate(cents)
            )[: ivfpq.N_PROBE]
        }
        victims = [
            c
            for c in range(len(cents))
            if c not in probed and os.path.isdir(os.path.join(out, f"cluster={c}"))
        ]
        assert victims, "need a non-probed populated cell to corrupt"
        with open(
            os.path.join(out, f"cluster={victims[0]}", "part-corrupt.parquet"),
            "wb",
        ) as fh:
            fh.write(b"not a parquet file")
        fresh = ivfpq.read_ivfpq_index(spark, out)
        again = [
            (r.vec_id, r.adc_dist)
            for r in ivfpq.ivfpq_search(
                fresh, cents, codebooks, qv, exclude_id=pq.PQ_QUERY_ID
            ).collect()
        ]
        assert again == mem  # pruned search never opens the corrupt file
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_ivfpq_topk_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        ivfpq.q_ivfpq_topk(spark, sf_dir),
        ivfpq.ORACLES["emb_ivfpq_topk"],
        sf_dir,
        name="emb_ivfpq_topk",
    )


def test_ivfpq_recall_audit_matches_oracle_and_is_useful(spark, sf_dir):
    df = ivfpq.q_ivfpq_recall_audit(spark, sf_dir)
    row = df.collect()[0]
    # the audit must measure a real (non-degenerate) search: full
    # truth set, and the probed compressed search catches most of it
    assert row["n_true"] == ivfpq.PQ_K
    assert 0 < row["n_caught"] <= row["n_true"]
    assert_matches_oracle(
        df,
        ivfpq.ORACLES["emb_ivfpq_recall_audit"],
        sf_dir,
        name="emb_ivfpq_recall_audit",
    )


def test_batch_search_agrees_with_single_query_path(spark, sf_dir, trained):
    """The relational batch path and the literal-table single-query
    path are independent implementations of the same search — for
    every qid in the batch their top-k must be identical."""
    codes, cents, codebooks = trained
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(ivfpq.BATCH_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"),
        ivfpq.fixed_point_vec("embedding").alias("qvec"),
    )
    batch = ivfpq.ivfpq_batch_search(spark, codes, cents, codebooks, queries)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["vec_id"], r["adc_dist"]))
    assert set(got) == set(ivfpq.BATCH_QUERY_IDS)
    for qid in ivfpq.BATCH_QUERY_IDS:
        qv = [
            int(v)
            for v in emb.filter(F.col("vec_id") == qid)
            .select(ivfpq.fixed_point_vec("embedding").alias("q"))
            .collect()[0]["q"]
        ]
        single = [
            (r["vec_id"], r["adc_dist"])
            for r in ivfpq.ivfpq_search(
                codes, cents, codebooks, qv, exclude_id=qid
            ).collect()
        ]
        assert got[qid] == single, f"qid={qid} diverged"


def test_batch_topk_matches_oracle(spark, sf_dir):
    df = ivfpq.q_ivfpq_batch_topk(spark, sf_dir)
    assert_matches_oracle(
        df,
        ivfpq.ORACLES["emb_ivfpq_batch_topk"],
        sf_dir,
        name="emb_ivfpq_batch_topk",
    )


def test_wide_and_long_search_paths_agree(trained, spark, sf_dir):
    """r13 optimization invariant: the fold-based wide search returns
    exactly what the long-format (disk-layout) search returns — same
    rows, same order, same exact integer distances."""
    codes, cents, codebooks = trained
    emb = load_table(spark, sf_dir, "embeddings")
    wide, w_cents, w_cbs = ivfpq.ivfpq_train_wide(emb)
    assert w_cents == cents and w_cbs == codebooks
    qv = [
        int(v)
        for v in emb.filter(F.col("vec_id") == pq.PQ_QUERY_ID)
        .select(pq.fixed_point_vec("embedding").alias("qv"))
        .collect()[0]["qv"]
    ]
    long_hits = [
        (r.vec_id, r.adc_dist)
        for r in ivfpq.ivfpq_search(
            codes, cents, codebooks, qv, exclude_id=pq.PQ_QUERY_ID
        ).collect()
    ]
    wide_hits = [
        (r.vec_id, r.adc_dist)
        for r in ivfpq.ivfpq_search_wide(
            wide, cents, codebooks, qv, exclude_id=pq.PQ_QUERY_ID
        ).collect()
    ]
    assert wide_hits == long_hits and len(wide_hits) == pq.PQ_K
    # and the long contract really is the exploded wide frame
    a = sorted(
        tuple(r) for r in codes.select("vec_id", "cluster", "m", "code").collect()
    )
    b = sorted(
        tuple(r)
        for r in ivfpq._explode_wide_codes_ivfpq(wide)
        .select("vec_id", "cluster", "m", "code")
        .collect()
    )
    assert a == b
