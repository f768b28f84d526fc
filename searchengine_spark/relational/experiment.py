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
    from searchengine_spark.io import ensure_min_partitions

    ev = load_table(spark, sf_dir, "events")
    cents = F.coalesce(
        F.round(F.col("value") * 100).cast("bigint"), F.lit(0)
    )

    # One md5 digest feeds TWO replicates (hex chars 1-13 and 14-26
    # are independent 52-bit uniforms). Three plan-shape fixes over
    # the original 2*B-wide single aggregate (r13 optimization round;
    # guide §2.3, §1.2 — same math bit for bit, isolated 8.3s -> 4.7s
    # cold / 4.0s -> 2.2s warm at sf0.1):
    #  - the uniforms are PROJECTED once per row below the aggregate
    #    instead of inlined into every CASE branch of every sum (the
    #    old plan carried ~450 md5/conv instances across 66 aggregate
    #    functions, far past what codegen CSE rescues);
    #  - ensure_min_partitions first: the projection is the expensive
    #    part of the scan and a single small parquet file otherwise
    #    runs it on ONE core (no-op at real scale);
    #  - replicates go through posexplode + ONE 3-function grouped
    #    aggregate instead of 66 aggregate functions, whose generated
    #    code alone took seconds to compile per run.
    def u(b: int):
        pair, half = divmod(b, 2)
        return (
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

    def w_of(ucol):
        expr = F.lit(6)
        for k in range(len(_POIS_CDF) - 1, -1, -1):
            expr = F.when(ucol < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(
                expr
            )
        return expr

    base = ensure_min_partitions(ev.select("event_id", "value")).select(
        cents.alias("c"),
        F.array(*[u(b) for b in range(BOOT_B)]).alias("_us"),
    )
    per_b = (
        base.select(
            "c",
            F.posexplode(
                F.transform(F.col("_us"), lambda x: w_of(x))
            ).alias("b", "w"),
        )
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("c")).alias("sb"),
            F.sum("w").alias("nb"),
        )
    )
    tot = ev.select(cents.alias("c")).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("c").alias("_sc")
    )
    reps = per_b.crossJoin(F.broadcast(tot)).select(
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


# ---------------------------------------------- power analysis / MDE

# Standard-normal quantiles, Python-computed once and embedded as
# literals in both engines (the transcendental-constant convention).
Z_ALPHA_2 = 1.959963984540054  # two-sided alpha = 0.05
Z_BETA = 0.8416212335729143  # power = 0.8
POWER_TARGET_REL_MDE = 0.10  # sizing target: detect a 10% lift


def q_events_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis for the repo's A/B readout: given the observed
    per-user metric variance under the derandomized assignment, (a)
    the minimum detectable effect at the CURRENT sample size
    (alpha=0.05 two-sided, power=0.8) and (b) the per-arm sample size
    a 10%-lift experiment would need. This is the question asked
    BEFORE shipping an experiment; the z-test/CUPED/bootstrap family
    answers the one after.

    mde = (z_a/2 + z_b) * sqrt(var_A/n_A + var_B/n_B);
    n_per_arm = ceil((z_a/2 + z_b)^2 * (var_A + var_B) / (rel*mean_A)^2).

    Determinism: per-user cents sums and their squares are exact
    bigints; variances are the identical final scalar formula in both
    engines; sqrt/ceil are exact IEEE ops; z-quantiles are shared
    Python literals. Scale shape: one scan -> user-keyed agg ->
    2-row variant fold -> 1-row release."""
    from searchengine_spark.operators.sampling import hash_bucket
    from searchengine_spark.relational.events import CUPED_SALT

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = (
        ev.select("user_id", F.coalesce(cents, F.lit(0)).alias("c"))
        .groupBy("user_id")
        .agg(F.sum("c").alias("y"))
        .withColumn(
            "variant",
            F.when(
                hash_bucket(F.col("user_id"), n_buckets=2, salt=CUPED_SALT) == 0,
                F.lit("A"),
            ).otherwise(F.lit("B")),
        )
    )
    per_var = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    a = per_var.filter(F.col("variant") == "A").select(
        F.col("n").alias("n_a"), F.col("sy").alias("sy_a"), F.col("syy").alias("syy_a")
    )
    b = per_var.filter(F.col("variant") == "B").select(
        F.col("n").alias("n_b"), F.col("sy").alias("sy_b"), F.col("syy").alias("syy_b")
    )
    z = F.lit(Z_ALPHA_2 + Z_BETA)

    def var_of(sy, syy, n):
        nd = F.col(n).cast("double")
        return (
            F.col(syy).cast("double")
            - F.col(sy).cast("double") * F.col(sy).cast("double") / nd
        ) / (nd - F.lit(1.0))

    joined = a.crossJoin(b).select(
        "n_a",
        "n_b",
        (F.col("sy_a").cast("double") / F.col("n_a").cast("double")).alias(
            "mean_a_cents"
        ),
        var_of("sy_a", "syy_a", "n_a").alias("var_a"),
        var_of("sy_b", "syy_b", "n_b").alias("var_b"),
    )
    se = F.sqrt(
        F.col("var_a") / F.col("n_a").cast("double")
        + F.col("var_b") / F.col("n_b").cast("double")
    )
    mde_abs = z * se
    target = F.lit(POWER_TARGET_REL_MDE) * F.col("mean_a_cents")
    n_req = F.ceil(
        z * z * (F.col("var_a") + F.col("var_b")) / (target * target)
    ).cast("bigint")
    return joined.select(
        "n_a",
        "n_b",
        F.round(F.col("mean_a_cents") / F.lit(100.0), 6).alias("mean_a"),
        F.round(mde_abs / F.lit(100.0), 6).alias("mde_abs"),
        F.round(mde_abs / F.col("mean_a_cents"), 6).alias("mde_rel"),
        n_req.alias("n_per_arm_for_10pct"),
    )


def _power_sql() -> str:
    from searchengine_spark.relational.events import CUPED_SALT

    z = repr(Z_ALPHA_2 + Z_BETA)
    return f"""
WITH per_user AS (
  SELECT user_id, SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS y
  FROM events GROUP BY user_id
),
tagged AS (
  SELECT y,
         CASE WHEN ('0x' || substr(md5('{CUPED_SALT}' || CAST(user_id AS VARCHAR)),
                    1, 15))::BIGINT % 2 = 0 THEN 'A' ELSE 'B' END AS variant
  FROM per_user
),
per_var AS (
  SELECT variant, count(*)::BIGINT AS n, SUM(y) AS sy, SUM(y * y) AS syy
  FROM tagged GROUP BY variant
),
j AS (
  SELECT a.n AS n_a, b.n AS n_b,
         CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_a_cents,
         (CAST(a.syy AS DOUBLE)
            - CAST(a.sy AS DOUBLE) * CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE))
           / (CAST(a.n AS DOUBLE) - 1.0) AS var_a,
         (CAST(b.syy AS DOUBLE)
            - CAST(b.sy AS DOUBLE) * CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE))
           / (CAST(b.n AS DOUBLE) - 1.0) AS var_b
  FROM (SELECT * FROM per_var WHERE variant = 'A') a,
       (SELECT * FROM per_var WHERE variant = 'B') b
)
SELECT n_a, n_b,
       round(mean_a_cents / 100.0, 6) AS mean_a,
       round('{z}'::DOUBLE * sqrt(var_a / CAST(n_a AS DOUBLE)
             + var_b / CAST(n_b AS DOUBLE)) / 100.0, 6) AS mde_abs,
       round('{z}'::DOUBLE * sqrt(var_a / CAST(n_a AS DOUBLE)
             + var_b / CAST(n_b AS DOUBLE)) / mean_a_cents, 6) AS mde_rel,
       CAST(ceil('{z}'::DOUBLE * '{z}'::DOUBLE * (var_a + var_b)
            / (({POWER_TARGET_REL_MDE} * mean_a_cents)
               * ({POWER_TARGET_REL_MDE} * mean_a_cents))) AS BIGINT)
         AS n_per_arm_for_10pct
FROM j
"""


QUERIES = {
    "events_bootstrap_ci": q_events_bootstrap_ci,
    "events_did_estimate": q_events_did,
    "events_ab_power_mde": q_events_ab_power,
}

ORACLES = {
    "events_bootstrap_ci": _bootstrap_sql(),
    "events_did_estimate": _did_sql(),
    "events_ab_power_mde": _power_sql(),
}
