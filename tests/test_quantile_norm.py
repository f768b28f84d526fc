"""text/quality.py quantile_normalize_by_source — exact mapping on a
planted two-source corpus. Registry oracle parity runs in
test_oracle_parity.py."""

from __future__ import annotations

import os

from searchengine_spark.text.quality import q_quality_quantile_normalized


def test_quantile_normalization_exact_mapping(spark, tmp_path_factory):
    # distinct_frac by construction: k distinct tokens out of n
    docs = [
        # source A: fracs 0.25, 0.5, 1.0 -> ranks 1,2,3 of n_s=3
        (0, "aa aa aa aa", "A"),          # 0.25
        (1, "aa bb aa bb", "A"),          # 0.5
        (2, "aa bb cc dd", "A"),          # 1.0
        # source B: fracs 0.5, 1.0 -> ranks 1,2 of n_s=2
        (3, "ee ff ee ff", "B"),          # 0.5
        (4, "ee ff gg hh", "B"),          # 1.0
    ]
    d = str(tmp_path_factory.mktemp("qnorm"))
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    out = {r.doc_id: r for r in q_quality_quantile_normalized(spark, d).collect()}
    assert len(out) == 5
    # global sorted multiset: [0.25, 0.5, 0.5, 1.0, 1.0], N=5
    # A: idx = (r-1)*(N-1)/(n_s-1) = 0, 2, 4 -> 0.25, 0.5, 1.0
    assert out[0].norm_score == 0.25
    assert out[1].norm_score == 0.5
    assert out[2].norm_score == 1.0
    # B: idx = 0, 4 -> 0.25, 1.0 (its 0.5-doc maps to the global MIN:
    # it is B's worst doc, and quantile mapping is rank-faithful)
    assert out[3].norm_score == 0.25
    assert out[4].norm_score == 1.0
    # scale preserved: every normalized value is a real global score
    assert {r.norm_score for r in out.values()} <= {0.25, 0.5, 1.0}


def test_quantile_normalization_monotone_within_source(spark, sf_dir):
    rows = q_quality_quantile_normalized(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.distinct_frac, r.norm_score))
    for src, pairs in by_src.items():
        pairs.sort()
        for (f1, n1), (f2, n2) in zip(pairs, pairs[1:]):
            assert n1 <= n2, f"{src}: normalization must be monotone"
