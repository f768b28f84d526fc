"""PMI collocation invariants."""

import math

from searchengine_spark.index.queries import _index
from searchengine_spark.text.pmi import MIN_COOC, q_word_pmi_pairs


def test_pmi_matches_hand_computation(spark, sf_dir):
    rows = q_word_pmi_pairs(spark, sf_dir).collect()
    assert rows
    idx = _index(spark, sf_dir)
    df = {r["word"]: r["doc_freq"] for r in idx.idf_values.collect()}
    n_docs = idx.scoring_params.collect()[0]["n_docs"]
    for r in rows:
        assert r["word_a"] < r["word_b"]
        assert r["n_ab"] >= MIN_COOC
        # co-occurrence can't exceed either marginal
        assert r["n_ab"] <= min(df[r["word_a"]], df[r["word_b"]])
        want = math.log10(
            (r["n_ab"] * n_docs) / (df[r["word_a"]] * df[r["word_b"]])
        )
        assert math.isclose(r["pmi"], want, abs_tol=1e-5)
