

def test_filter_agreement_confusion_table(spark, sf_dir):
    from searchengine_spark.pipeline import QUERIES

    rows = QUERIES["pipeline_filter_agreement"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 4
    assert len({(r.gate_pass, r.lm_keep) for r in rows}) == len(rows)
    total = sum(r.n_docs for r in rows)
    assert total > 0
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-4
    # the median split puts at least half the docs on the keep side
    # (<= only ties inflate it)
    kept = sum(r.n_docs for r in rows if r.lm_keep)
    assert kept >= total // 2


def test_shared_stage_path_matches_self_contained(spark, sf_dir):
    """r13 optimization invariant: _stages fed the session-shared
    full-corpus shingle/band caches returns row-identical decision
    frames to the self-contained derivation, for both gates."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.dedup import _bands, _shingles
    from searchengine_spark.pipeline import _stages

    docs = load_table(spark, sf_dir, "documents")
    for gate in ("basic", "gopher"):
        plain = _stages(docs, gate=gate)
        shared = _stages(
            docs,
            gate=gate,
            shared_shingles=_shingles(spark, sf_dir),
            shared_bands=_bands(spark, sf_dir),
        )
        for a, b, key in zip(plain, shared, ("quality", "exact", "drop")):
            ra = sorted(r["doc_id"] for r in a.select("doc_id").collect())
            rb = sorted(r["doc_id"] for r in b.select("doc_id").collect())
            assert ra == rb, f"{gate}/{key} diverged"
