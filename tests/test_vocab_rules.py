"""text/vocab_stats.py (OOV rate, burstiness) and the directed
association rules in operators/itemsets.py — planted exact values.
Registry oracle parity runs in test_oracle_parity.py."""

from __future__ import annotations

import os

import pytest

from searchengine_spark.operators.itemsets import q_association_rules
from searchengine_spark.text.vocab_stats import (
    BURST_MIN_DF,
    VOCAB_TOP_V,
    q_oov_rate,
    q_word_burstiness,
)


def _plant_docs(spark, tmp_path_factory, rows, name):
    d = str(tmp_path_factory.mktemp(name))
    spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (t, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


# exactly VOCAB_TOP_V common words present in every document
_COMMON = [f"word{chr(97 + i)}{chr(97 + i)}" for i in range(VOCAB_TOP_V)]


def test_oov_rate_planted_exact(spark, tmp_path_factory):
    base = " ".join(_COMMON)
    rows = [(base, "clean")] * 30 + [(base + " zzrare zzrare", "tail")] * 30
    d = _plant_docs(spark, tmp_path_factory, rows, "oov")
    out = {r.source: r for r in q_oov_rate(spark, d).collect()}
    assert out["clean"].n_oov == 0 and out["clean"].oov_rate == 0.0
    # tail docs: VOCAB_TOP_V in-vocab tokens + 2 OOV each
    assert out["tail"].n_oov == 60
    assert out["tail"].oov_rate == pytest.approx(
        60 / (30 * (VOCAB_TOP_V + 2)), abs=1e-6
    )


def test_burstiness_planted_exact(spark, tmp_path_factory):
    # 'bursty': tf=5 in half the docs, absent in the rest -> VMR 2.5;
    # 'flat' (every _COMMON word): tf=1 everywhere -> VMR 0
    base = " ".join(_COMMON)
    rows = [(base + " bursty" * 5, "a")] * 30 + [(base, "a")] * 30
    d = _plant_docs(spark, tmp_path_factory, rows, "burst")
    out = {r.w: r for r in q_word_burstiness(spark, d).collect()}
    assert out["bursty"].df == 30 >= BURST_MIN_DF
    assert out["bursty"].mean_tf == pytest.approx(2.5, abs=1e-6)
    assert out["bursty"].vmr == pytest.approx(2.5, abs=1e-6)
    flat = [r for w, r in out.items() if w != "bursty"]
    assert flat and all(r.vmr == 0.0 for r in flat)
    # ranking: the bursty word must lead
    ranked = q_word_burstiness(spark, d).collect()
    assert ranked[0].w == "bursty"


def test_association_rules_directed_confidence(spark, tmp_path_factory):
    # B's docs are a subset of A's: conf(B->A) = 1.0, conf(A->B) = 0.75
    filler = "pad1 pad2"
    rows = (
        [("aword bword " + filler, "s")] * 30
        + [("aword " + filler, "s")] * 10
        + [(filler, "s")] * 10
    )
    d = _plant_docs(spark, tmp_path_factory, rows, "rules")
    out = {(r.ante, r.cons): r for r in q_association_rules(spark, d).collect()}
    ba = out[("bword", "aword")]
    assert ba.confidence == 1.0 and ba.n_pair == 30
    ab = out[("aword", "bword")]
    assert ab.confidence == pytest.approx(0.75, abs=1e-6)
    # lift is direction-free: n_pair * n_docs / (n_a * n_b)
    assert ab.lift == ba.lift == pytest.approx(30 * 50 / (40 * 30), abs=1e-6)


def test_keyness_finds_planted_domain_word(spark, tmp_path_factory):
    from searchengine_spark.text.vocab_stats import q_source_keyness

    base = " ".join(_COMMON[:10])
    # 'legalese' saturates source L and never appears in source P
    rows = [(base + " legalese legalese", "L")] * 20 + [(base, "P")] * 20
    d = _plant_docs(spark, tmp_path_factory, rows, "keyness")
    out = q_source_keyness(spark, d).collect()
    l_rows = [r for r in out if r.source == "L"]
    assert l_rows and l_rows[0].w == "legalese" and l_rows[0].rank == 1
    assert l_rows[0].g2 > 0
    assert l_rows[0].n_in_source == 40
    # the common words are distributed evenly, so P has no key word
    # stronger than noise; legalese must never rank for P
    assert all(r.w != "legalese" for r in out if r.source == "P")
