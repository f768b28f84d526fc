"""Distribution-level hypothesis tests: two-sample Kolmogorov-
Smirnov and Benjamini-Hochberg FDR over a metric family.

The mean-level experimentation readouts (events.py z-test/CUPED,
experiment.py bootstrap/DiD) can miss a treatment that moves the
SHAPE of a metric without moving its mean; the KS statistic
D = sup_v |F_A(v) - F_B(v)| is the standard whole-distribution test.
And once an experiment reads out MANY metrics (here: one z-test per
event_type), per-test significance over-rejects — Benjamini-Hochberg
is the standard step-up control of the false-discovery rate.

Float discipline (repo convention): every statistic is built from
exact integer counts/moments (value in cents); the only float ops
are divisions/sqrt on those integers — IEEE-deterministic and
identical expression-for-expression in both engines; transcendental
constants (the KS critical coefficient, the BH normal quantiles) are
Python-computed literals baked into BOTH twins, never recomputed
in-engine.

Scale shape:
- KS ECDF: per-(variant,cents) counts (one keyed shuffle), then the
  cumulative sums run as the repo's two-level bucket prefix sum
  (per-bucket totals -> offsets window over the bounded bucket table
  -> within-bucket window), so no single task ever sorts the whole
  distinct-value table. Distinct cents is additionally bounded by
  the metric's price grid, not by row count.
- BH: one keyed aggregate to (event_type, variant) moments — a
  |types| x 2 table; the ranking window runs over |types| rows
  (domain-bounded).

Reference parity: abh2050/searchengine has no statistics surface;
extension family per the 100 TB brief (see relational/experiment.py).
"""

from __future__ import annotations

import math
from statistics import NormalDist

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

KS_SALT = "ks"
BH_SALT = "bh"
KS_ALPHA = 0.05
BH_ALPHA = 0.05
KS_BUCKET_CENTS = 1_000  # $10-wide ECDF prefix-sum buckets
BH_MAX_M = 12  # baked BH quantiles cover up to this many metrics

# c(alpha) = sqrt(-ln(alpha/2) / 2) — Kolmogorov critical coefficient,
# baked (transcendental).
KS_COEF = round(math.sqrt(-math.log(KS_ALPHA / 2.0) / 2.0), 12)

# z-critical for the BH step-up: crit[m][k] = Phi^-1(1 - (k*alpha/m)/2)
# for every metric-count m the query might observe. Baked so neither
# engine evaluates an inverse normal CDF.
_BH_CRIT: dict[int, dict[int, float]] = {
    m: {
        k: round(NormalDist().inv_cdf(1.0 - (k * BH_ALPHA / m) / 2.0), 12)
        for k in range(1, m + 1)
    }
    for m in range(1, BH_MAX_M + 1)
}


def _cents(col):
    return F.coalesce(F.round(col * 100).cast("bigint"), F.lit(0))


def q_events_ks_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test of the event-value distribution between the
    derandomized A/B halves (md5 coin on user_id, salt-namespaced).

    Under the null (a hash coin carries no treatment) D should sit
    below the alpha=0.05 critical line c(alpha)*sqrt((nA+nB)/(nA*nB))
    — the audit's null behavior is part of the point, exactly like
    events_conversion_ab."""
    from searchengine_spark.event_time import exact_floor_div
    from searchengine_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        _cents(F.col("value")).alias("c"),
        (hash_bucket(F.col("user_id"), n_buckets=2, salt=KS_SALT) == 0).alias(
            "va"
        ),
    )
    per_v = rows.groupBy("c").agg(
        F.sum(F.col("va").cast("long")).alias("a"),
        F.sum((~F.col("va")).cast("long")).alias("b"),
    )
    # Two-level prefix sum over distinct cents (bucket = $10 range).
    per_v = per_v.withColumn("_bk", exact_floor_div(F.col("c"), KS_BUCKET_CENTS))
    totals = per_v.groupBy("_bk").agg(
        F.sum("a").alias("_ta"), F.sum("b").alias("_tb")
    )
    off_win = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bk",
        F.coalesce(F.sum("_ta").over(off_win), F.lit(0)).alias("_offa"),
        F.coalesce(F.sum("_tb").over(off_win), F.lit(0)).alias("_offb"),
    )
    in_win = (
        Window.partitionBy("_bk")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        per_v.join(F.broadcast(offsets), "_bk")
        .withColumn("_cuma", F.col("_offa") + F.sum("a").over(in_win))
        .withColumn("_cumb", F.col("_offb") + F.sum("b").over(in_win))
    )
    n = rows.agg(
        F.sum(F.col("va").cast("long")).cast("bigint").alias("n_a"),
        F.sum((~F.col("va")).cast("long")).cast("bigint").alias("n_b"),
    )
    diffs = cum.crossJoin(F.broadcast(n)).select(
        "c",
        "n_a",
        "n_b",
        F.abs(
            F.col("_cuma").cast("double") / F.col("n_a").cast("double")
            - F.col("_cumb").cast("double") / F.col("n_b").cast("double")
        ).alias("d"),
    )
    dmax = diffs.agg(F.max("d").alias("_dmax"))
    return (
        diffs.crossJoin(F.broadcast(dmax))
        .filter(F.col("d") == F.col("_dmax"))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.round(F.max("d"), 6).alias("ks_d"),
            F.min("c").alias("d_at_cents"),
            F.round(
                F.lit(KS_COEF)
                * F.sqrt(
                    (F.max("n_a") + F.max("n_b")).cast("double")
                    / (F.max("n_a") * F.max("n_b")).cast("double")
                ),
                6,
            ).alias("threshold"),
            (
                F.max("d")
                > F.lit(KS_COEF)
                * F.sqrt(
                    (F.max("n_a") + F.max("n_b")).cast("double")
                    / (F.max("n_a") * F.max("n_b")).cast("double")
                )
            ).alias("reject_null"),
        )
    )


_KS_SQL = f"""
WITH rows_ AS (
  SELECT COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS c,
         (('0x' || substr(md5('{KS_SALT}' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           % 2) = 0 AS va
  FROM events
), per_v AS (
  SELECT c,
         CAST(SUM(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN va THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM rows_ GROUP BY c
), n AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
  FROM per_v
), cum AS (
  SELECT c,
         SUM(a) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cuma,
         SUM(b) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cumb
  FROM per_v
), diffs AS (
  SELECT c, n.n_a, n.n_b,
         abs(CAST(cuma AS DOUBLE) / CAST(n.n_a AS DOUBLE)
             - CAST(cumb AS DOUBLE) / CAST(n.n_b AS DOUBLE)) AS d
  FROM cum, n
), dmax AS (
  SELECT max(d) AS dm FROM diffs
)
SELECT max(n_a) AS n_a, max(n_b) AS n_b,
       round(max(d), 6) AS ks_d,
       min(c) AS d_at_cents,
       round({KS_COEF!r} * sqrt(CAST(max(n_a) + max(n_b) AS DOUBLE)
                                / CAST(max(n_a) * max(n_b) AS DOUBLE)), 6)
         AS threshold,
       max(d) > {KS_COEF!r} * sqrt(CAST(max(n_a) + max(n_b) AS DOUBLE)
                                   / CAST(max(n_a) * max(n_b) AS DOUBLE))
         AS reject_null
FROM diffs, dmax
WHERE diffs.d = dmax.dm
"""


def _bh_crit_column() -> F.Column:
    """CASE chain mapping the observed (m, k) to the baked z-critical
    literal; NULL past BH_MAX_M (query degrades loudly, not wrongly)."""
    expr = F.lit(None).cast("double")
    for m in range(BH_MAX_M, 0, -1):
        inner = F.lit(None).cast("double")
        for k in range(m, 0, -1):
            inner = F.when(F.col("k") == k, F.lit(_BH_CRIT[m][k])).otherwise(
                inner
            )
        expr = F.when(F.col("m") == m, inner).otherwise(expr)
    return expr


def _bh_crit_sql() -> str:
    ms = []
    for m in range(1, BH_MAX_M + 1):
        ks = " ".join(
            f"WHEN k = {k} THEN {_BH_CRIT[m][k]!r}" for k in range(1, m + 1)
        )
        ms.append(f"WHEN m = {m} THEN (CASE {ks} END)")
    return "CASE " + " ".join(ms) + " END"


def q_events_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Welch z-test of mean event value per event_type (the
    metric family), then the Benjamini-Hochberg step-up at FDR 0.05:
    rank metrics by |z| descending; reject ranks 1..k* where k* is
    the largest k with |z|_(k) >= Phi^-1(1 - (k*alpha/m)/2).

    All moments are exact integer sums; the per-rank critical values
    are baked quantile literals, so the full verdict table
    hash-checks."""
    from searchengine_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        _cents(F.col("value")).alias("c"),
        (hash_bucket(F.col("user_id"), n_buckets=2, salt=BH_SALT) == 0).alias(
            "va"
        ),
    )
    gm = rows.groupBy("event_type").agg(
        F.sum(F.col("va").cast("long")).alias("n1"),
        F.sum(F.when(F.col("va"), F.col("c")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("va"), F.col("c") * F.col("c")).otherwise(0)).alias(
            "q1"
        ),
        F.sum((~F.col("va")).cast("long")).alias("n0"),
        F.sum(F.when(~F.col("va"), F.col("c")).otherwise(0)).alias("s0"),
        F.sum(
            F.when(~F.col("va"), F.col("c") * F.col("c")).otherwise(0)
        ).alias("q0"),
    )

    def mean(s, nn):
        return F.col(s).cast("double") / F.col(nn).cast("double")

    def svar(s, q, nn):
        nd = F.col(nn).cast("double")
        return (
            F.col(q).cast("double")
            - F.col(s).cast("double") * F.col(s).cast("double") / nd
        ) / (nd - F.lit(1.0))

    se = F.sqrt(
        svar("s1", "q1", "n1") / F.col("n1").cast("double")
        + svar("s0", "q0", "n0") / F.col("n0").cast("double")
    )
    z = F.when(
        (F.col("n1") < 2) | (F.col("n0") < 2) | (se == 0.0), F.lit(None)
    ).otherwise((mean("s1", "n1") - mean("s0", "n0")) / se)
    typed = gm.select(
        "event_type",
        F.col("n1").cast("bigint").alias("n_a"),
        F.col("n0").cast("bigint").alias("n_b"),
        z.alias("_z"),
    )
    rank_win = Window.orderBy(
        F.abs(F.col("_z")).desc_nulls_last(), F.col("event_type")
    )
    m_win = Window.partitionBy()
    ranked = (
        typed.withColumn("k", F.row_number().over(rank_win))
        .withColumn("m", F.count(F.lit(1)).over(m_win))
        .withColumn("crit", _bh_crit_column())
    )
    kstar = F.max(
        F.when(F.abs(F.col("_z")) >= F.col("crit"), F.col("k")).otherwise(0)
    ).over(m_win)
    return (
        ranked.withColumn("_kstar", kstar)
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round("_z", 6).alias("z_score"),
            F.col("k").cast("bigint").alias("z_rank"),
            F.round("crit", 6).alias("bh_crit_z"),
            (F.col("k") <= F.col("_kstar")).alias("rejected"),
        )
        .orderBy("z_rank")
    )


_BH_SQL = f"""
WITH rows_ AS (
  SELECT event_type,
         COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS c,
         (('0x' || substr(md5('{BH_SALT}' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           % 2) = 0 AS va
  FROM events
), gm AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN va THEN c ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN va THEN c * c ELSE 0 END) AS BIGINT) AS q1,
         CAST(SUM(CASE WHEN va THEN 0 ELSE 1 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN va THEN 0 ELSE c END) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN va THEN 0 ELSE c * c END) AS BIGINT) AS q0
  FROM rows_ GROUP BY event_type
), typed AS (
  SELECT event_type, n1 AS n_a, n0 AS n_b,
         CASE WHEN n1 < 2 OR n0 < 2 OR
                   sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                      + ((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE)) = 0.0
              THEN NULL
              ELSE (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                   / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                        + ((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE))
         END AS _z
  FROM gm
), ranked AS (
  SELECT event_type, n_a, n_b, _z,
         CAST(row_number() OVER (ORDER BY abs(_z) DESC NULLS LAST, event_type)
              AS BIGINT) AS k,
         CAST(count(*) OVER () AS BIGINT) AS m
  FROM typed
), crit AS (
  SELECT *, {_bh_crit_sql()} AS crit_z FROM ranked
), star AS (
  SELECT *, MAX(CASE WHEN abs(_z) >= crit_z THEN k ELSE 0 END) OVER () AS kstar
  FROM crit
)
SELECT event_type, n_a, n_b,
       round(_z, 6) AS z_score,
       k AS z_rank,
       round(crit_z, 6) AS bh_crit_z,
       k <= kstar AS rejected
FROM star
ORDER BY z_rank
"""



MEDIAN_Z = 1.959964  # Phi^-1(0.975), baked (same literal family as events.py Z_CRIT)


def q_events_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median of the event value with a distribution-free 95%
    confidence interval from order statistics: ranks N/2 -+
    z*sqrt(N)/2 (the binomial argument — P(X_(lo) <= median <=
    X_(hi)) >= 0.95 with NO distributional assumption; normal
    approximation to the binomial quantile, standard for large N).

    The companion to events_bootstrap_ci (mean) and privacy_dp_
    quantile (private): the robust-location readout. Rank selection
    happens WITHOUT a global sort: per-cents counts, cumulative
    counts via ordered aggregation over the distinct-cents table
    (value-grid-bounded, same argument as the KS ECDF), then each
    target rank's value is min(c | cum >= rank) — three conditional
    1-row aggregates."""
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(_cents(F.col("value")).alias("c"))
    per_v = rows.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    cum_win = (
        Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_v.withColumn("cum", F.sum("cnt").over(cum_win))
    n1 = rows.agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("double")
    half_w = F.lit(MEDIAN_Z) * F.sqrt(nd) / F.lit(2.0)
    ranks = n1.select(
        "n",
        F.greatest(F.lit(1), F.floor(nd / 2.0 - half_w).cast("bigint")).alias(
            "r_lo"
        ),
        F.ceil(nd / 2.0).cast("bigint").alias("r_med"),
        F.least(F.col("n"), F.ceil(nd / 2.0 + half_w).cast("bigint")).alias(
            "r_hi"
        ),
    )
    sel = cum.crossJoin(F.broadcast(ranks))

    def value_at(rank_col: str):
        return F.min(F.when(F.col("cum") >= F.col(rank_col), F.col("c")))

    return sel.agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.round(value_at("r_med").cast("double") / F.lit(100.0), 6).alias(
            "median"
        ),
        F.round(value_at("r_lo").cast("double") / F.lit(100.0), 6).alias(
            "ci_lo"
        ),
        F.round(value_at("r_hi").cast("double") / F.lit(100.0), 6).alias(
            "ci_hi"
        ),
    )


_MEDIAN_SQL = f"""
WITH rows_ AS (
  SELECT COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS c FROM events
), per_v AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_ GROUP BY c
), cum AS (
  SELECT c, SUM(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum
  FROM per_v
), nn AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM per_v
), ranks AS (
  SELECT n,
         GREATEST(1, CAST(FLOOR(CAST(n AS DOUBLE) / 2.0
             - {MEDIAN_Z!r} * SQRT(CAST(n AS DOUBLE)) / 2.0) AS BIGINT))
           AS r_lo,
         CAST(CEIL(CAST(n AS DOUBLE) / 2.0) AS BIGINT) AS r_med,
         LEAST(n, CAST(CEIL(CAST(n AS DOUBLE) / 2.0
             + {MEDIAN_Z!r} * SQRT(CAST(n AS DOUBLE)) / 2.0) AS BIGINT))
           AS r_hi
  FROM nn
)
SELECT MAX(n) AS n_events,
       round(CAST(MIN(CASE WHEN cum >= r_med THEN c END) AS DOUBLE) / 100.0, 6)
         AS median,
       round(CAST(MIN(CASE WHEN cum >= r_lo THEN c END) AS DOUBLE) / 100.0, 6)
         AS ci_lo,
       round(CAST(MIN(CASE WHEN cum >= r_hi THEN c END) AS DOUBLE) / 100.0, 6)
         AS ci_hi
FROM cum, ranks
"""


QUERIES = {
    "events_median_ci": q_events_median_ci,
    "events_ks_variant": q_events_ks_variant,
    "events_bh_fdr": q_events_bh_fdr,
}
ORACLES = {
    "events_median_ci": _MEDIAN_SQL,
    "events_ks_variant": _KS_SQL,
    "events_bh_fdr": _BH_SQL,
}
