"""k-anonymity audit + generalization ladder invariants."""

from searchengine_spark.io import load_table
from searchengine_spark.operators.privacy import (
    K_ANON,
    q_k_anonymity_audit,
    q_k_anonymize_generalize,
)


def test_audit_partitions_all_customers(spark, sf_dir):
    total = load_table(spark, sf_dir, "customer").count()
    rows = q_k_anonymity_audit(spark, sf_dir).collect()
    assert sum(r["group_n"] for r in rows) == total
    for r in rows:
        assert r["k_ok"] == int(r["group_n"] >= K_ANON)
        assert 1 <= r["distinct_sensitive"] <= r["group_n"]


def test_generalization_conserves_rows_and_raises_k(spark, sf_dir):
    total = load_table(spark, sf_dir, "customer").count()
    before = {
        (r["c_nationkey"], r["c_mktsegment"]): r["group_n"]
        for r in q_k_anonymity_audit(spark, sf_dir).collect()
    }
    after = q_k_anonymize_generalize(spark, sf_dir).collect()
    assert sum(r["group_n"] for r in after) == total
    for r in after:
        if r["segment_gen"] == "*":
            # pooled groups are exactly the sum of the risky ones
            pooled = sum(
                n for (nk, _), n in before.items()
                if nk == r["c_nationkey"] and n < K_ANON
            )
            assert r["group_n"] == pooled
        else:
            # surviving named groups were already k-anonymous
            assert before[(r["c_nationkey"], r["segment_gen"])] >= K_ANON
        assert r["published"] == int(r["group_n"] >= K_ANON)


def test_dp_exponential_topk_matches_oracle(spark, sf_dir):
    """Gumbel-trick exponential mechanism: k rows released, ranking
    deterministic under the seeded noise, no raw counts in the frame."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators import privacy as P
    from tests.helpers import assert_matches_oracle

    df = P.q_dp_exponential_topk(spark, sf_dir)
    rows = df.collect()
    assert [r["rnk"] for r in rows] == list(range(1, P.EM_K + 1))
    assert "n" not in df.columns  # the release never carries truth
    assert_matches_oracle(
        df,
        P.ORACLES["privacy_dp_exponential_topk"],
        sf_dir,
        name="privacy_dp_exponential_topk",
    )


def test_t_closeness_zero_for_global_mirror(spark, tmp_path):
    # two groups with IDENTICAL band distributions -> both emd == 0
    import pandas as pd

    from searchengine_spark.operators.privacy import q_t_closeness_audit

    rows = []
    for seg in ("A", "B"):
        for band_val, cnt in ((50.0, 4), (250.0, 4)):
            rows += [(1, seg, band_val)] * cnt
    pdf = pd.DataFrame(rows, columns=["c_nationkey", "c_mktsegment", "c_acctbal"])
    d = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/customer.parquet"
    )
    out = q_t_closeness_audit(spark, d).collect()
    assert len(out) == 2
    assert all(r["emd"] == 0.0 and r["t_ok"] == 1 for r in out)


def test_t_closeness_flags_concentrated_group(spark, tmp_path):
    # group B sits entirely in the far band -> emd near the max
    import pandas as pd

    from searchengine_spark.operators.privacy import q_t_closeness_audit

    rows = [(1, "A", 50.0)] * 8 + [(1, "A", 1050.0)] * 8 + [(1, "B", 1050.0)] * 8
    pdf = pd.DataFrame(rows, columns=["c_nationkey", "c_mktsegment", "c_acctbal"])
    d = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/customer.parquet"
    )
    out = {r["c_mktsegment"]: r for r in q_t_closeness_audit(spark, d).collect()}
    assert out["B"]["emd"] > out["A"]["emd"]
    assert out["B"]["t_ok"] == 0  # concentrated group violates t


def test_t_closeness_bounds_on_real_data(spark, sf_dir):
    from searchengine_spark.operators.privacy import q_t_closeness_audit

    for r in q_t_closeness_audit(spark, sf_dir).collect():
        assert 0.0 <= r["emd"] <= 1.0
        assert r["group_n"] > 0


def test_stable_histogram_suppresses_rare_bins(spark, tmp_path_factory):
    import hashlib
    import math
    import os

    from searchengine_spark.operators.privacy import (
        SH_SALT,
        SH_SCALE,
        SH_TAU,
        q_dp_stable_histogram,
    )

    def noise(word: str) -> float:
        h = int(hashlib.md5(f"{SH_SALT}{word}".encode()).hexdigest()[:13], 16)
        v = (h + 0.5) / float(2**52) - 0.5
        return -SH_SCALE * math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v))

    common = [f"tok{chr(97 + i)}{chr(97 + i)}" for i in range(10)]
    rows = [(i, " ".join(common), "en", "s", 10) for i in range(40)]
    rows.append((40, "rareword " + " ".join(common), "en", "s", 10))
    d = str(tmp_path_factory.mktemp("shist"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    out = {r.w: r.noisy_count for r in q_dp_stable_histogram(spark, d).collect()}
    # replica: released set must match the mechanism exactly
    expected = {}
    for w, n in [(c, 41) for c in common] + [("rareword", 1)]:
        nc = round(n + noise(w), 4)
        if nc > SH_TAU:
            expected[w] = nc
    assert out == expected
    # the singleton bin must be suppressed (1 + |Laplace(2)| cannot
    # clear tau ~= 27.8 for this seeded draw — and the set release is
    # the privacy property under test)
    assert "rareword" not in out
    assert len(out) == 10
