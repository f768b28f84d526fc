"""Token PSI: planted drift is detected, identical corpora are ~0,
and the top-K cut is deterministic."""

import math

from searchengine_spark.text.drift import token_psi


def _df(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_identical_corpora_psi_zero(spark):
    texts = ["alpha beta gamma delta"] * 20
    got = token_psi(_df(spark, texts), _df(spark, texts, 100)).collect()
    assert got and all(r["psi"] == 0.0 for r in got)


def test_planted_drift_flags_the_shifted_word(spark):
    ref = ["common words here"] * 30
    cand = ["common words here"] * 15 + ["novel spike term"] * 15
    got = {r["word"]: r for r in token_psi(_df(spark, ref), _df(spark, cand, 500)).collect()}
    # the injected words dominate psi; stable words stay near zero
    assert got["spike"]["n_ref"] == 0 and got["spike"]["n_cand"] == 15
    stable = got["common"]["psi"]
    assert abs(got["spike"]["psi"]) > abs(stable)
    assert got["spike"]["psi"] > 0.0

    # hand-check one value: smoothed p/q with the joint vocab
    vocab = 6  # common words here novel spike term
    t_ref, t_cand = 90, 90
    p = (0 + 1) / (t_ref + vocab)
    q = (15 + 1) / (t_cand + vocab)
    assert got["spike"]["psi"] == round((p - q) * math.log(p / q), 6)
