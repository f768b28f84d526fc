"""Experimentation statistics beyond the CUPED/z-test pair in
relational/events.py: the Poisson bootstrap (THE distributed
confidence-interval method — per-row replicate weights, no resample
shuffle) and difference-in-differences (the quasi-experimental
readout when assignment isn't randomized over time).

Both follow the repo's experimentation conventions (events.py CUPED,
round 8): metric in integer CENTS, derandomized md5 coins/uniforms so
the exact frames hash-check in DuckDB, conditional integer aggregates
only, float expressions confined to identical final scalar formulas.

Reference parity note: the reference app (abh2050/searchengine) has
no statistics surface at all — this family is part of the 100 TB
extension, where "rerun it and see" is not an option and every
readout needs an uncertainty estimate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.event_time import event_time_seconds, exact_floor_div
from searchengine_spark.io import load_table

# ---------------------------------------------- Poisson bootstrap CI

# Poisson(1) inverse-CDF thresholds, Python-computed and baked as
# rounded literals into BOTH twins (the repo's convention for
# transcendental constants — never recompute ln/exp in-engine where a
# ulp could flip a bucket). P(X <= k) = e^-1 * sum_{i<=k} 1/i!.
_POIS_CDF = []
_acc = 0.0
for _k in range(6):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(round(_acc, 12))
BOOT_B = 32  # replicates
BOOT_SALT = "boot"
_BOOT_HASH_BITS = 52  # 13 hex digits, same as the DSIR/privacy uniforms
BOOT_CI_LO, BOOT_CI_HI = 0.025, 0.975


def _pois_weight_case(u_expr: str) -> str:
    """SQL CASE chain mapping a uniform in [0,1) to a Poisson(1) draw
    (capped at 6 — P(X>6) ~ 8e-5, bias far below CI resolution)."""
    branches = " ".join(
        f"WHEN {u_expr} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 6 END"


def q_events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean event value.

    The classic bootstrap resamples n rows B times — impossible to
    coordinate across a cluster. The Poisson bootstrap (Chamandy et
    al., Google 2012) replaces resampling with an independent
    Poisson(1) weight per (row, replicate): replicate b's mean is
    sum(w_b*x)/sum(w_b), computable as B conditional aggregates on
    the SAME single scan — no shuffle of the data at all, and
    replicate sums merge across partitions like any algebraic agg.

    Derandomized: w_b = InvCDF_Poisson(md5-uniform(salt, b, id)), so
    the exact replicate table (and hence the CI) hash-checks in
    DuckDB. Value is integer cents; each replicate mean is rounded to
    6 before the percentile; the CI bounds are exact percentiles of
    the B=32 replicate means (round-6 both sides).

    Scale shape: one scan -> 2*B integer conditional sums (1-row
    frame) -> stack to B rows -> percentile over 32 rows. The B md5s
    per row ride the scan in whole-stage codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.coalesce(
        F.round(F.col("value") * 100).cast("bigint"), F.lit(0)
    )
    base = ev.select("event_id", cents.alias("c"))

    def w(b: int):
        # one md5 digest feeds TWO replicates (hex chars 1-13 and
        # 14-26 are independent 52-bit uniforms) — the md5s are the
        # dominant cost of the scan, and this halves them
        pair, half = divmod(b, 2)
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{BOOT_SALT}{pair}_"),
                            F.col("event_id").cast("string"),
                        ).cast("binary")
                    ),
                    1 + 13 * half,
                    13,
                ),
                16,
                10,
            ).cast("bigint")
            .cast("double")
            + F.lit(0.5)
        ) / F.lit(float(2**_BOOT_HASH_BITS))
        expr = F.lit(6)
        for k in range(len(_POIS_CDF) - 1, -1, -1):
            expr = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(expr)
        return expr

    aggs = []
    for b in range(BOOT_B):
        wb = w(b)
        aggs.append(F.sum(wb * F.col("c")).alias(f"_s{b}"))
        aggs.append(F.sum(wb).alias(f"_n{b}"))
    one = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("c").alias("_sc"),
        *aggs,
    )
    stack = ", ".join(f"CAST({b} AS BIGINT), _s{b}, _n{b}" for b in range(BOOT_B))
    reps = one.selectExpr(
        "_n",
        "_sc",
        f"stack({BOOT_B}, {stack}) AS (b, sb, nb)",
    ).select(
        "_n",
        "_sc",
        F.round(F.col("sb").cast("double") / F.col("nb") / 100.0, 6).alias(
            "mb"
        ),
    )
    return reps.agg(
        F.max(F.col("_n")).cast("bigint").alias("n_events"),
        F.round(
            F.max(F.col("_sc")).cast("double") / F.max(F.col("_n")) / 100.0, 6
        ).alias("mean_value"),
        F.round(F.percentile(F.col("mb"), F.lit(BOOT_CI_LO)), 6).alias("ci_lo"),
        F.round(F.percentile(F.col("mb"), F.lit(BOOT_CI_HI)), 6).alias("ci_hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
    )


def _bootstrap_sql() -> str:
    u = (
        f"((('0x' || substr(md5('{BOOT_SALT}' || CAST(b.b // 2 AS VARCHAR)"
        f" || '_' || CAST(e.event_id AS VARCHAR)),"
        f" 1 + 13 * (b.b % 2), 13))::BIGINT + 0.5)"
        f" / {float(2**_BOOT_HASH_BITS)!r})"
    )
    return f"""
WITH ev AS (
  SELECT event_id,
         COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS c
  FROM events
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc
  FROM ev
),
reps AS (
  SELECT b.b,
         CAST(SUM({_pois_weight_case(u)} * e.c) AS BIGINT) AS sb,
         CAST(SUM({_pois_weight_case(u)}) AS BIGINT) AS nb
  FROM ev e CROSS JOIN (SELECT unnest(range({BOOT_B})) AS b) b
  GROUP BY b.b
),
mb AS (
  SELECT round(CAST(sb AS DOUBLE) / nb / 100.0, 6) AS mb FROM reps
)
SELECT tot.n AS n_events,
       round(CAST(tot.sc AS DOUBLE) / tot.n / 100.0, 6) AS mean_value,
       round(quantile_cont(mb, {BOOT_CI_LO}), 6) AS ci_lo,
       round(quantile_cont(mb, {BOOT_CI_HI}), 6) AS ci_hi,
       CAST(COUNT(*) AS BIGINT) AS n_replicates
FROM mb, tot
GROUP BY tot.n, tot.sc
"""


# ------------------------------------------ difference-in-differences

DID_SALT = "did"


def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: DiD = (T_post - T_pre) -
    (C_post - C_pre) over per-user period totals — the standard
    quasi-experimental estimator when a launch hits one group at a
    known time and the other group carries the trend. Treatment is
    the derandomized md5 coin on user_id (DID_SALT namespaces it away
    from the CUPED/z-test assignment); the period split is the corpus
    time midpoint (same rule as CUPED); the metric is per-user summed
    cents per period.

    SE from per-user DELTA moments: var(post - pre)/n per group,
    which keeps the -2*cov(pre, post) term the four-cell independent
    formula drops (a user's pre and post totals are positively
    correlated through their activity level, so the independent-cell
    SE was biased conservative — round-9 ADVICE). Every moment is an
    exact integer sum (sum(post-pre), sum((post-pre)^2)). Scale
    shape: one scan -> per-user conditional sums keyed on the uniform
    user_id -> one 2-row group aggregate -> 1-row fold. Same
    decimal(38,0) production note as CUPED.
    """
    from searchengine_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    secs = event_time_seconds(ev, "ts")
    rng = ev.select(secs.alias("s")).agg(
        F.min("s").alias("_mn"), F.max("s").alias("_mx")
    )
    cents = F.coalesce(F.round(F.col("value") * 100).cast("bigint"), F.lit(0))
    per_user = (
        ev.select("user_id", secs.alias("s"), cents.alias("c"))
        .crossJoin(F.broadcast(rng))
        .withColumn("_mid", exact_floor_div(F.col("_mn") + F.col("_mx"), 2))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("s") < F.col("_mid"), F.col("c")).otherwise(0))
            .alias("pre"),
            F.sum(F.when(F.col("s") >= F.col("_mid"), F.col("c")).otherwise(0))
            .alias("post"),
        )
        .withColumn(
            "treated",
            hash_bucket(F.col("user_id"), n_buckets=2, salt=DID_SALT) == 1,
        )
    )
    cells = per_user.groupBy("treated").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").alias("s0"),
        F.sum("post").alias("s1"),
        F.sum(
            (F.col("post") - F.col("pre")) * (F.col("post") - F.col("pre"))
        ).alias("qd"),
    )
    nd = F.col("n").cast("double")
    m0 = F.col("s0").cast("double") / nd
    m1 = F.col("s1").cast("double") / nd
    # var of the per-user delta (pairs pre/post, keeping their
    # covariance); delta's own mean stays m1 - m0 for the readout but
    # the variance uses the single-pass (sd, qd) moments.
    md = (F.col("s1") - F.col("s0")).cast("double") / nd
    vd = F.col("qd").cast("double") / nd - md * md
    per_g = cells.select(
        "treated",
        "n",
        m0.alias("m0"),
        m1.alias("m1"),
        (vd / nd).alias("var_term"),
        (m1 - m0).alias("delta"),
    )
    t = per_g.filter(F.col("treated")).select(
        F.col("n").alias("nt"),
        F.col("m0").alias("tm0"),
        F.col("m1").alias("tm1"),
        F.col("delta").alias("td"),
        F.col("var_term").alias("tv"),
    )
    c = per_g.filter(~F.col("treated")).select(
        F.col("n").alias("nc"),
        F.col("m0").alias("cm0"),
        F.col("m1").alias("cm1"),
        F.col("delta").alias("cd"),
        F.col("var_term").alias("cv"),
    )
    did = F.col("td") - F.col("cd")
    se = F.sqrt(F.col("tv") + F.col("cv"))
    return t.crossJoin(F.broadcast(c)).select(
        F.col("nt").cast("bigint").alias("n_treated"),
        F.col("nc").cast("bigint").alias("n_control"),
        F.round(F.col("td") / 100.0, 6).alias("treated_delta"),
        F.round(F.col("cd") / 100.0, 6).alias("control_delta"),
        F.round(did / 100.0, 6).alias("did"),
        F.round(se / 100.0, 6).alias("se"),
        # degenerate guard (same convention as the z-test's pooled-
        # rate guard): zero per-user delta variance in both groups
        # means t is undefined, not infinite
        F.round(F.when(se > 0, did / se), 6).alias("t_stat"),
    )


def _did_sql() -> str:
    return f"""
WITH rng AS (
  SELECT MIN(epoch_us(ts) // 1000000) AS mn,
         MAX(epoch_us(ts) // 1000000) AS mx
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN (epoch_us(ts) // 1000000) < (mn + mx) // 2
                  THEN COALESCE(CAST(round(value * 100) AS BIGINT), 0)
                  ELSE 0 END) AS BIGINT) AS pre,
         CAST(SUM(CASE WHEN (epoch_us(ts) // 1000000) >= (mn + mx) // 2
                  THEN COALESCE(CAST(round(value * 100) AS BIGINT), 0)
                  ELSE 0 END) AS BIGINT) AS post,
         (('0x' || substr(md5('{DID_SALT}' || CAST(user_id AS VARCHAR)),
            1, 15))::BIGINT % 2) = 1 AS treated
  FROM events, rng
  GROUP BY user_id
),
cells AS (
  SELECT treated,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS BIGINT) AS s0,
         CAST(SUM(post) AS BIGINT) AS s1,
         CAST(SUM((post - pre) * (post - pre)) AS BIGINT) AS qd
  FROM per_user GROUP BY treated
),
per_g AS (
  SELECT treated, n,
         CAST(s1 AS DOUBLE) / n - CAST(s0 AS DOUBLE) / n AS delta,
         (CAST(qd AS DOUBLE) / n
            - (CAST(s1 - s0 AS DOUBLE) / n) * (CAST(s1 - s0 AS DOUBLE) / n))
           / n AS var_term
  FROM cells
)
SELECT t.n AS n_treated, c.n AS n_control,
       round(t.delta / 100.0, 6) AS treated_delta,
       round(c.delta / 100.0, 6) AS control_delta,
       round((t.delta - c.delta) / 100.0, 6) AS did,
       round(sqrt(t.var_term + c.var_term) / 100.0, 6) AS se,
       round(CASE WHEN sqrt(t.var_term + c.var_term) > 0
             THEN (t.delta - c.delta) / sqrt(t.var_term + c.var_term)
             END, 6) AS t_stat
FROM (SELECT * FROM per_g WHERE treated) t,
     (SELECT * FROM per_g WHERE NOT treated) c
"""


QUERIES = {
    "events_bootstrap_ci": q_events_bootstrap_ci,
    "events_did_estimate": q_events_did,
}

ORACLES = {
    "events_bootstrap_ci": _bootstrap_sql(),
    "events_did_estimate": _did_sql(),
}
