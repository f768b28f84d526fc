"""Round-10 operators: tokenizer fertility audit (and, below, the
incremental-ANN and streaming near-dup additions as they land).

Oracle parity for registry names runs in test_oracle_parity; here we
pin the semantic invariants the hash compare can't express.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from searchengine_spark.registry import all_oracles, all_queries
from tests.helpers import assert_matches_oracle


def test_fertility_fixture_sanity(spark, sf_dir):
    rows = all_queries()["text_tokenizer_fertility"](spark, sf_dir).collect()
    assert rows, "fixture corpus has languages"
    for r in rows:
        # every alpha run is at least one BPE pre-token, and digit/
        # punct runs add more — so tokens/word >= 1 on organic text
        assert r.tokens_per_word >= 1.0, r
        # BPE pre-tokens are non-empty substrings, so bytes/token >= 1
        assert r.bytes_per_token >= 1.0, r
        assert r.total_words <= r.total_tokens


def test_fertility_flags_multibyte_language(spark, tmp_path_factory):
    """A planted 2-language corpus: the same sentence, but lang zz
    spells it with accented (non-ASCII) characters. The ASCII-centric
    BPE pre-tokenizer fragments every accented word into several
    tokens, so zz's tokens/word must come out far above en's — which
    is exactly the under-served-language signal the fertility audit
    exists to surface. Hash-checked against the oracle on the planted
    table too."""
    ascii_text = "the quick brown fox jumps over the lazy dog"
    wide_text = "thé qüick brôwn föx jümps övér thé läzy dög"
    rows = [
        (0, ascii_text, "en", "src", len(ascii_text)),
        (1, ascii_text, "en", "src", len(ascii_text)),
        (2, wide_text, "zz", "src", len(wide_text)),
        (3, wide_text, "zz", "src", len(wide_text)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path_factory.mktemp("fert"))
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r.lang: r
        for r in all_queries()["text_tokenizer_fertility"](spark, d).collect()
    }
    assert out["zz"].tokens_per_word > out["en"].tokens_per_word * 1.5
    assert out["zz"].total_bytes > out["en"].total_bytes  # 2-byte chars
    assert_matches_oracle(
        all_queries()["text_tokenizer_fertility"](spark, d),
        all_oracles()["text_tokenizer_fertility"],
        d,
        name="text_tokenizer_fertility_planted",
    )


def test_fertility_plan_is_map_plus_single_agg(spark, sf_dir):
    plan = (
        all_queries()["text_tokenizer_fertility"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan


# ---------------------------------------------- incremental ANN append

def test_append_assign_is_exact_nearest_cell_and_code(spark, sf_dir):
    """Brute-force recheck for a handful of batch vectors: the
    appended row's cluster is the true integer argmin over the frozen
    centroids, and each subspace code the true argmin over that
    subspace's codebook."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.ivfpq import (
        _append_split,
        _cached_base_train,
    )
    from searchengine_spark.operators.kmeans import fixed_point_vec
    from searchengine_spark.operators.pq import M, SUB_DIM

    _, cents, cbs = _cached_base_train(spark, sf_dir)
    _, batch = _append_split(load_table(spark, sf_dir, "embeddings"))
    got = {
        (r.vec_id, r.m): (r.cluster, r.code)
        for r in all_queries()["ann_ivf_append_assign"](spark, sf_dir)
        .filter(F.col("vec_id") < 100)
        .collect()
    }
    assert got, "batch split contains low ids"
    qrows = (
        batch.filter(F.col("vec_id") < 100)
        .select("vec_id", fixed_point_vec("embedding").alias("qv"))
        .collect()
    )
    for r in qrows:
        qv = [int(v) for v in r.qv]
        cl = min(
            range(len(cents)),
            key=lambda j: (
                sum((a - b) * (a - b) for a, b in zip(qv, cents[j])),
                j,
            ),
        )
        res = [a - b for a, b in zip(qv, cents[cl])]
        for m in range(M):
            sub = res[m * SUB_DIM : (m + 1) * SUB_DIM]
            code = min(
                range(len(cbs[m])),
                key=lambda j: (
                    sum((a - b) * (a - b) for a, b in zip(sub, cbs[m][j])),
                    j,
                ),
            )
            assert got[(r.vec_id, m)] == (cl, code)


def test_append_extends_index_and_search_still_works(spark, sf_dir):
    """The appended codes drop into the existing index: union(base
    codes, batch codes) covers the corpus with one row per (vec, m),
    and a probed search over the merged index returns k hits."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.ivfpq import (
        _append_split,
        _cached_base_train,
        ivfpq_search,
    )
    from searchengine_spark.operators.kmeans import fixed_point_vec
    from searchengine_spark.operators.pq import M, PQ_K, PQ_QUERY_ID

    base_codes, cents, cbs = _cached_base_train(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    merged = base_codes.unionByName(
        all_queries()["ann_ivf_append_assign"](spark, sf_dir)
    )
    assert merged.count() == emb.count() * M
    assert merged.select("vec_id").distinct().count() == emb.count()
    qv = [
        int(v)
        for v in emb.filter(F.col("vec_id") == PQ_QUERY_ID)
        .select(fixed_point_vec("embedding").alias("qv"))
        .collect()[0]["qv"]
    ]
    hits = ivfpq_search(
        merged, cents, cbs, qv, exclude_id=PQ_QUERY_ID
    ).collect()
    assert len(hits) == PQ_K


def test_drift_audit_quiet_in_distribution(spark, sf_dir):
    """Random split of one distribution: the audit must NOT cry wolf
    (growth stays in the generalization-gap band, under the bound)."""
    rows = all_queries()["ann_ivf_append_drift_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert not r.drifted, r
        assert 0.8 <= r.growth <= 1.4, r


def test_drift_audit_trips_on_shifted_batch(spark, tmp_path_factory):
    """Plant a distribution shift: batch vectors get +0.5 on every
    coordinate. The frozen codebook quantizes them far worse, so the
    per-cell growth must blow past the bound and flag a retrain."""
    import os

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.ivfpq import ANN_BATCH_MOD, ANN_BASE_SALT
    from searchengine_spark.operators.sampling import hash_bucket

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    is_batch = (
        hash_bucket(F.col("vec_id"), n_buckets=ANN_BATCH_MOD, salt=ANN_BASE_SALT)
        == 0
    )
    shifted = emb.select(
        "vec_id",
        F.when(
            is_batch, F.transform("embedding", lambda x: x + F.lit(0.5))
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    )
    d = str(tmp_path_factory.mktemp("drift"))
    shifted.write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    rows = all_queries()["ann_ivf_append_drift_audit"](spark, d).collect()
    assert any(r.drifted for r in rows), rows
    assert_matches_oracle(
        all_queries()["ann_ivf_append_drift_audit"](spark, d),
        all_oracles()["ann_ivf_append_drift_audit"],
        d,
        name="ann_ivf_append_drift_audit_planted",
    )


# ---------------------------------------------- streaming near-dup

def test_stream_neardup_multibatch_equals_batch(spark, tmp_path_factory):
    """The parity that matters: split the documents table into FOUR
    files so the replay runs four micro-batches (maxFilesPerTrigger=1)
    with banding + stream-static join + dropDuplicates state spanning
    batches — and the result must still hash-match the one-shot batch
    oracle."""
    import os

    from searchengine_spark.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    d = str(tmp_path_factory.mktemp("snd"))
    docs.repartition(4).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    out = all_queries()["stream_neardup_replay"](spark, d)
    assert_matches_oracle(
        out,
        all_oracles()["stream_neardup_replay"],
        d,
        name="stream_neardup_replay_multibatch",
    )


def test_stream_neardup_catches_planted_duplicate(spark, tmp_path_factory):
    """Plant identical documents across the arrival split: every
    (arriving, indexed) id pair must surface, exactly once each
    despite matching in all bands (dropDuplicates collapses the
    multi-band hits)."""
    import os

    from searchengine_spark.operators.sampling import hash_bucket
    from searchengine_spark.streaming.replay import (
        STREAM_ND_MOD,
        STREAM_ND_SALT,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, text, "en", "src", len(text)) for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path_factory.mktemp("sndp"))
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    is_new = (
        hash_bucket(F.col("doc_id"), n_buckets=STREAM_ND_MOD, salt=STREAM_ND_SALT)
        == 0
    )
    n_new = docs.filter(is_new).count()
    n_old = 30 - n_new
    assert n_new > 0 and n_old > 0
    pairs = all_queries()["stream_neardup_replay"](spark, d)
    assert pairs.count() == n_new * n_old
    assert_matches_oracle(
        pairs,
        all_oracles()["stream_neardup_replay"],
        d,
        name="stream_neardup_replay_planted",
    )


# ---------------------------------------------- probe-sweep recall curve

def test_probe_recall_curve_shape(spark, sf_dir):
    """The CANDIDATE set grows with n_probe, but top-k recall under
    ADC need not be monotone — a quantization-noise candidate from a
    newly probed cell can displace a true neighbor from the top-k
    (observed at sf0.001: 3 hits at n_probe=3, 2 at n_probe=4).
    Pin the true invariants: full coverage of 1..K, bounded counts,
    and a best point no worse than the single-probe point."""
    from searchengine_spark.operators.ivfpq import K, PQ_K

    rows = sorted(
        all_queries()["emb_ivf_probe_recall_curve"](spark, sf_dir).collect(),
        key=lambda r: r["n_probe"],
    )
    assert [r["n_probe"] for r in rows] == list(range(1, K + 1))
    caught = [r["n_caught"] for r in rows]
    assert all(0 <= c <= PQ_K for c in caught)
    assert max(caught) >= caught[0] > 0
    assert rows[0]["k"] == PQ_K
