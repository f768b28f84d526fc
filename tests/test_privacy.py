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
