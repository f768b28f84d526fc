"""k-anonymity / l-diversity audit and a generalization ladder.

Training-data curation has a privacy leg the scrubbing pass
(text/redaction.py) only half-covers: after PII strings are masked,
the RECORD-LEVEL combination of quasi-identifiers (here: nation x
market segment) can still single people out. The standard checks are
k-anonymity (every QI group has >= k members) and l-diversity (every
group carries >= l distinct sensitive values, here account-balance
bands), plus the standard repair: generalize the failing groups'
finest attribute to '*' and re-check, suppressing what still fails.

Scale shape: two groupBy passes over the dimension table — map-side
partial counts, no windows, no joins against the fact side. The
audit is exact (no sampling): at 100 TB the group count is bounded by
the QI domain, not the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

K_ANON = 5
L_DIV = 3
SENS_BAND = 100.0  # account-balance band width (the sensitive attribute)


def _sens_band(col) -> F.Column:
    return F.floor(col / F.lit(SENS_BAND)).cast("bigint")


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("group_n"),
            F.countDistinct(_sens_band(F.col("c_acctbal"))).alias(
                "distinct_sensitive"
            ),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_n",
            "distinct_sensitive",
            (F.col("group_n") >= K_ANON).cast("int").alias("k_ok"),
            (F.col("distinct_sensitive") >= L_DIV).cast("int").alias("l_ok"),
        )
    )


def q_k_anonymize_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One generalization step: QI groups below k lose their finest
    attribute (segment -> '*'), then the regrouped table is re-checked
    and still-failing groups are marked unpublishable."""
    cust = load_table(spark, sf_dir, "customer")
    sizes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n0")
    )
    generalized = (
        cust.join(F.broadcast(sizes), ["c_nationkey", "c_mktsegment"])
        .withColumn(
            "segment_gen",
            F.when(F.col("n0") < K_ANON, F.lit("*")).otherwise(
                F.col("c_mktsegment")
            ),
        )
        .groupBy("c_nationkey", "segment_gen")
        .agg(F.count("*").alias("group_n"))
    )
    return generalized.select(
        "c_nationkey",
        "segment_gen",
        "group_n",
        (F.col("group_n") >= K_ANON).cast("int").alias("published"),
    )


_AUDIT_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       count(*)::BIGINT AS group_n,
       count(DISTINCT CAST(floor(c_acctbal / {SENS_BAND}) AS BIGINT))::BIGINT
         AS distinct_sensitive,
       CASE WHEN count(*) >= {K_ANON} THEN 1 ELSE 0 END AS k_ok,
       CASE WHEN count(DISTINCT CAST(floor(c_acctbal / {SENS_BAND}) AS BIGINT))
            >= {L_DIV} THEN 1 ELSE 0 END AS l_ok
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""

_GENERALIZE_SQL = f"""
WITH sizes AS (
  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n0
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
gen AS (
  SELECT c.c_nationkey,
         CASE WHEN s.n0 < {K_ANON} THEN '*' ELSE c.c_mktsegment END
           AS segment_gen
  FROM customer c
  JOIN sizes s ON c.c_nationkey = s.c_nationkey
              AND c.c_mktsegment = s.c_mktsegment
)
SELECT c_nationkey, segment_gen,
       count(*)::BIGINT AS group_n,
       CASE WHEN count(*) >= {K_ANON} THEN 1 ELSE 0 END AS published
FROM gen GROUP BY c_nationkey, segment_gen
"""

QUERIES = {
    "privacy_k_anonymity_audit": q_k_anonymity_audit,
    "privacy_k_anonymize_generalize": q_k_anonymize_generalize,
}
ORACLES = {
    "privacy_k_anonymity_audit": _AUDIT_SQL,
    "privacy_k_anonymize_generalize": _GENERALIZE_SQL,
}
