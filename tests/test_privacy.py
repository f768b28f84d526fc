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
