

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
