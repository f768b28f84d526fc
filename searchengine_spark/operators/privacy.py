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


DP_SCALE = 20.0  # Laplace b = sensitivity/epsilon = 1/0.05
_HASH_BITS = 52  # 13 hex chars -> fits a double's mantissa exactly


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of per-nation customer counts:
    count + Laplace(DP_SCALE) noise via inverse-CDF over a SEEDED
    per-key uniform (md5 of the group key), so the release is
    reproducible and oracle-checkable. The derandomized-noise trick is
    standard for testable DP pipelines; swapping the hash-uniform for
    a real RNG changes nothing in the plan (one agg + map-side noise
    arithmetic, no extra shuffle)."""
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    h = F.conv(
        F.substring(F.md5(F.col("c_nationkey").cast("string").cast("binary")), 1, 13),
        16,
        10,
    ).cast("bigint")
    # u in (0,1): the +0.5 keeps v strictly inside (-0.5, 0.5) so the
    # log argument is never 0
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**_HASH_BITS))
    v = u - F.lit(0.5)
    noise = (
        -F.lit(DP_SCALE)
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )
    return counts.select(
        "c_nationkey",
        F.round(F.col("n") + noise, 4).alias("noisy_count"),
    )


EM_EPS_SCALE = 8.0  # 2*sensitivity/eps for the Gumbel-trick scores
EM_K = 5


def q_dp_exponential_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-mechanism top-k selection (via the Gumbel trick:
    adding independent Gumbel(2/eps) noise to utilities and taking
    the arg-top-k is EXACTLY one exponential-mechanism draw per slot,
    Durfee & Rogers 2019): release WHICH k nations have the most
    customers without releasing exact counts. Same derandomized-noise
    convention as q_dp_noisy_counts — the per-key md5 uniform stands
    in for the RNG so the release is reproducible and the twin checks
    the full selection, ranking included. Gumbel = -b*ln(-ln(u));
    scores round to 6 BEFORE ranking so the k-cutoff is reproducible
    across engines. The released frame carries the noisy score, never
    the true count."""
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("em"), F.col("c_nationkey").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**_HASH_BITS))
    gumbel = -F.lit(EM_EPS_SCALE) * F.log(-F.log(u))
    from pyspark.sql import Window

    noisy = counts.select(
        "c_nationkey", F.round(F.col("n") + gumbel, 6).alias("noisy_score")
    )
    w = Window.orderBy(F.desc("noisy_score"), F.asc("c_nationkey"))
    return (
        noisy.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= EM_K)
        .select("rnk", "c_nationkey", "noisy_score")
        .orderBy("rnk")
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

_DP_SQL = f"""
WITH counts AS (
  SELECT c_nationkey, count(*)::BIGINT AS n FROM customer GROUP BY c_nationkey
),
seeded AS (
  SELECT c_nationkey, n,
         (CAST(('0x' || substr(md5(CAST(c_nationkey AS VARCHAR)), 1, 13))
               AS BIGINT) + 0.5) / {float(2 ** _HASH_BITS)!r} - 0.5 AS v
  FROM counts
)
SELECT c_nationkey,
       round(n + (-{DP_SCALE!r}) * sign(v) * ln(1.0 - 2.0 * abs(v)), 4)
         AS noisy_count
FROM seeded
"""

_EM_SQL = f"""
WITH counts AS (
  SELECT c_nationkey, count(*)::BIGINT AS n FROM customer GROUP BY c_nationkey
),
seeded AS (
  SELECT c_nationkey, n,
         (CAST(('0x' || substr(md5('em' || CAST(c_nationkey AS VARCHAR)), 1, 13))
               AS BIGINT) + 0.5) / {float(2 ** _HASH_BITS)!r} AS u
  FROM counts
),
noisy AS (
  SELECT c_nationkey,
         round(n + (-{EM_EPS_SCALE!r}) * ln(-ln(u)), 6) AS noisy_score
  FROM seeded
)
SELECT rnk, c_nationkey, noisy_score FROM (
  SELECT c_nationkey, noisy_score,
         ROW_NUMBER() OVER (
           ORDER BY noisy_score DESC, c_nationkey ASC
         ) AS rnk
  FROM noisy
) WHERE rnk <= {EM_K}
ORDER BY rnk
"""

QUERIES = {
    "privacy_k_anonymity_audit": q_k_anonymity_audit,
    "privacy_k_anonymize_generalize": q_k_anonymize_generalize,
    "privacy_dp_noisy_counts": q_dp_noisy_counts,
    "privacy_dp_exponential_topk": q_dp_exponential_topk,
}
ORACLES = {
    "privacy_k_anonymity_audit": _AUDIT_SQL,
    "privacy_k_anonymize_generalize": _GENERALIZE_SQL,
    "privacy_dp_noisy_counts": _DP_SQL,
    "privacy_dp_exponential_topk": _EM_SQL,
}
