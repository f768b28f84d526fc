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

# ------------------------------------------- local DP: randomized response

RR_P = 0.75  # keep the true bit with p, else report a fair coin
# eps = ln((p + (1-p)/2) / ((1-p)/2)) = ln(7) for p = 0.75
RR_KEEP_SALT = "rrkeep"
RR_COIN_SALT = "rrcoin"
# |pi_hat - pi| <= (1/p) * sqrt(ln(2/0.01) / (2 n)) whp; +1/(p*n) slack
RR_DELTA_LN = 5.2983  # ln(2/0.01) rounded to the shared literal


def _rr_uniform(salt: str):
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(salt), F.col("user_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(2**_HASH_BITS))


def q_rr_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL differential privacy — Warner (1965) randomized response,
    the mechanism behind RAPPOR: each user reports their true bit
    ("did I ever hit an error event") with probability p, otherwise a
    fair coin, and the aggregator debiases pî = (mean_report −
    (1−p)/2)/p. eps = ln((p+(1−p)/2)/((1−p)/2)) = ln 7 at p = 0.75.
    Completes the privacy family's third model: k-anonymity
    (syntactic), central DP (noisy counts / EM top-k), and now local
    DP, where the TRUE bit never has to leave the user's row.

    Derandomized per repo convention: both the keep-coin and the
    noise-coin are seeded md5 uniforms, so the exact released counts
    — and the debiased estimate's error against the true rate, which
    a production release would not emit but the audit must — are
    hash-checked. Integer counts feed identical scalar float
    expressions; one user-keyed aggregate, 1-row output.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "error").cast("long")).alias("b")
    )
    keep = _rr_uniform(RR_KEEP_SALT) < F.lit(RR_P)
    coin = (_rr_uniform(RR_COIN_SALT) < F.lit(0.5)).cast("long")
    reported = per_user.select(
        "b", F.when(keep, F.col("b")).otherwise(coin).alias("r")
    )
    agg = reported.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("b").alias("n_true"),
        F.sum("r").alias("n_reported"),
    )
    nd = F.col("n").cast("double")
    mean_r = F.col("n_reported").cast("double") / nd
    est = (mean_r - F.lit((1.0 - RR_P) / 2.0)) / F.lit(RR_P)
    true_frac = F.col("n_true").cast("double") / nd
    bound = (
        F.lit(1.0 / RR_P) * F.sqrt(F.lit(RR_DELTA_LN) / (F.lit(2.0) * nd))
        + F.lit(1.0 / RR_P) / nd
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("n_reported").cast("bigint").alias("n_reported"),
        F.round(true_frac, 6).alias("true_frac"),
        F.round(est, 6).alias("est_frac"),
        F.round(F.abs(est - true_frac), 6).alias("abs_err"),
        (F.abs(est - true_frac) <= bound).alias("within_bound"),
    )


_RR_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id
),
reported AS (
  SELECT b,
         CASE WHEN ((('0x' || substr(md5('{RR_KEEP_SALT}'
                || CAST(user_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                / {float(2 ** _HASH_BITS)!r}) < {RR_P}
              THEN b
              ELSE CASE WHEN ((('0x' || substr(md5('{RR_COIN_SALT}'
                     || CAST(user_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                     / {float(2 ** _HASH_BITS)!r}) < 0.5
                   THEN 1 ELSE 0 END
         END AS r
  FROM per_user
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b) AS BIGINT) AS n_true,
         CAST(SUM(r) AS BIGINT) AS n_reported
  FROM reported
)
SELECT n AS n_users, n_reported,
       round(CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE), 6) AS true_frac,
       round((CAST(n_reported AS DOUBLE) / CAST(n AS DOUBLE)
              - {(1.0 - RR_P) / 2.0}) / {RR_P}, 6) AS est_frac,
       round(abs((CAST(n_reported AS DOUBLE) / CAST(n AS DOUBLE)
              - {(1.0 - RR_P) / 2.0}) / {RR_P}
             - CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS abs_err,
       abs((CAST(n_reported AS DOUBLE) / CAST(n AS DOUBLE)
              - {(1.0 - RR_P) / 2.0}) / {RR_P}
           - CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE))
         <= ({1.0 / RR_P} * sqrt({RR_DELTA_LN}
             / (2.0 * CAST(n AS DOUBLE)))
             + {1.0 / RR_P} / CAST(n AS DOUBLE)) AS within_bound
FROM agg
"""


# ------------------------------------------- DP mean (clip + Laplace)

# Contribution bound C = $4,000: the fixture's per-user totals sit
# near $3,300 at every SF (the generator is per-user stationary), so
# ~the top fifth of users clip — the audit shows a REAL clip fraction
# instead of 0 or 1. eps = 1 per release.
DPM_CLIP_CENTS = 400_000
DPM_SUM_SCALE = 400_000.0  # Laplace b = C/eps
DPM_CNT_SCALE = 1.0  # Laplace b = 1/eps for the count
DPM_SUM_SALT = "dpmS"
DPM_CNT_SALT = "dpmN"


def _lap(salt: str, scale: float):
    """Seeded Laplace(scale) from the md5 uniform of a constant salt —
    ONE draw per release (the salt is the key), the derandomized-noise
    convention of q_dp_noisy_counts."""
    h = F.conv(
        F.substring(F.md5(F.lit(salt).cast("binary")), 1, 13), 16, 10
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**_HASH_BITS))
    v = u - F.lit(0.5)
    return (
        -F.lit(scale) * F.signum(v) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )


def q_dp_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private MEAN of per-user event spend — the
    clip-then-Laplace recipe that underlies every DP aggregate (and
    DP-SGD's gradient step): bound each USER's total contribution at
    C (user-level sensitivity, the unit that matters — one person may
    have many events), add Laplace(C/eps) to the clipped sum and
    Laplace(1/eps) to the user count, release their ratio. The frame
    carries the true clipped mean and the release error as audit
    columns (the privacy_rr_frequency convention), plus the clip
    fraction — the knob a practitioner tunes first.

    Scale shape: one user-keyed aggregate (uniform key), then 1-row
    arithmetic; the clip is exact integer cents (least(sum, C)), so
    everything before the two Laplace draws hash-checks as integers.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.coalesce(F.round(F.col("value") * 100).cast("bigint"), F.lit(0))
    per_user = ev.groupBy("user_id").agg(F.sum(cents).alias("s"))
    clipped = per_user.select(
        F.least(F.col("s"), F.lit(DPM_CLIP_CENTS)).alias("cs"),
        (F.col("s") > DPM_CLIP_CENTS).cast("long").alias("was_clipped"),
    )
    agg = clipped.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cs").alias("clip_sum"),
        F.sum("was_clipped").alias("n_clipped"),
    )
    noisy_sum = F.col("clip_sum") + _lap(DPM_SUM_SALT, DPM_SUM_SCALE)
    noisy_n = F.col("n_users") + _lap(DPM_CNT_SALT, DPM_CNT_SCALE)
    true_mean = F.col("clip_sum").cast("double") / F.col("n_users")
    rel_mean = F.round(noisy_sum / noisy_n / 100.0, 6)
    return agg.select(
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(F.col("n_clipped") / F.col("n_users"), 6).alias(
            "clip_fraction"
        ),
        rel_mean.alias("released_mean"),
        F.round(true_mean / 100.0, 6).alias("true_clipped_mean"),
        F.round(F.abs(rel_mean - F.round(true_mean / 100.0, 6)), 6).alias(
            "abs_error"
        ),
    )


_DPM_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0))
              AS BIGINT) AS s
  FROM events GROUP BY user_id
),
clipped AS (
  SELECT LEAST(s, {DPM_CLIP_CENTS}) AS cs,
         CASE WHEN s > {DPM_CLIP_CENTS} THEN 1 ELSE 0 END AS was_clipped
  FROM per_user
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(cs) AS BIGINT) AS clip_sum,
         CAST(SUM(was_clipped) AS BIGINT) AS n_clipped
  FROM clipped
),
lap AS (
  SELECT
    (SELECT -{DPM_SUM_SCALE!r} * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))
     FROM (SELECT (('0x' || substr(md5('{DPM_SUM_SALT}'), 1, 13))::BIGINT
                   + 0.5) / {float(2 ** _HASH_BITS)!r} AS u)) AS ns,
    (SELECT -{DPM_CNT_SCALE!r} * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))
     FROM (SELECT (('0x' || substr(md5('{DPM_CNT_SALT}'), 1, 13))::BIGINT
                   + 0.5) / {float(2 ** _HASH_BITS)!r} AS u)) AS nn
)
SELECT n_users,
       round(CAST(n_clipped AS DOUBLE) / n_users, 6) AS clip_fraction,
       round((clip_sum + ns) / (n_users + nn) / 100.0, 6) AS released_mean,
       round(CAST(clip_sum AS DOUBLE) / n_users / 100.0, 6)
         AS true_clipped_mean,
       round(abs(round((clip_sum + ns) / (n_users + nn) / 100.0, 6)
                 - round(CAST(clip_sum AS DOUBLE) / n_users / 100.0, 6)), 6)
         AS abs_error
FROM agg, lap
"""


# ------------------------------------------- DP quantile (EM, binned)

DPQ_BIN_CENTS = 500  # $5 value bins — candidate outputs for the EM
DPQ_SCALE = 5.0  # Gumbel b = 2*sensitivity/eps (rank sensitivity 1)
DPQ_SALT = "dpq"
DPQ_Q_NUM, DPQ_Q_DEN = 1, 2  # the median


def q_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private MEDIAN of event value via the
    exponential mechanism over discretized value bins (Smith 2011's
    quantile EM, binned): candidate outputs are the $5 bin boundaries
    across the observed range, utility(b) = -|#{x below b} - n/2|
    (rank distance, sensitivity 1), one EM draw via the repo's
    seeded-Gumbel argmax convention (privacy_dp_exponential_topk).
    Completes the privacy family's fourth primitive: central-DP
    counts (Laplace), selection (EM top-k), local-DP frequency (RR),
    and now a DP ORDER statistic. The released value is the bin
    boundary; the frame carries the true median and the release error
    as the audit columns (same convention as privacy_rr_frequency —
    the audit is the point of the query).

    Scale shape: one scan -> per-bin counts (bin count is bounded by
    the VALUE RANGE / bin width, not the data; the prefix window runs
    over that bounded frame) -> Gumbel argmax via
    TakeOrderedAndProject(1) -> 1-row fold with the exact percentile.
    All rank arithmetic is exact integers; the only floats are the
    Gumbel (identical ln chains both engines) rounded to 6 before the
    argmax with bin-id tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.coalesce(F.round(F.col("value") * 100).cast("bigint"), F.lit(0))
    # truncating div on BOTH sides (Spark div == DuckDB //, the repo
    # convention) — equals floor for the positive fixture values
    binned = ev.select(cents.alias("c")).selectExpr(
        f"c div {DPQ_BIN_CENTS} as b"
    )
    hist = binned.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    rng = hist.agg(
        F.min("b").alias("_b0"),
        F.max("b").alias("_b1"),
        F.sum("cnt").alias("_n"),
    )
    bins = (
        rng.select(
            F.explode(F.sequence(F.col("_b0"), F.col("_b1"))).alias("b"),
            "_n",
        )
        .join(hist, "b", "left")
        .select("b", "_n", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    ranked = bins.withColumn(
        "below", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).withColumn(
        "u",
        -F.abs(
            F.col("below") - F.expr(f"(_n * {DPQ_Q_NUM}) div {DPQ_Q_DEN}")
        ),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(DPQ_SALT), F.col("b").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    uu = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**_HASH_BITS))
    noisy = ranked.select(
        "b",
        "_n",
        F.round(
            F.col("u") - F.lit(DPQ_SCALE) * F.log(-F.log(uu)), 6
        ).alias("noisy_u"),
    )
    pick = noisy.orderBy(F.desc("noisy_u"), F.asc("b")).limit(1)
    truth = ev.select(cents.alias("c")).agg(
        F.round(F.percentile(F.col("c").cast("double"), F.lit(0.5)), 6).alias(
            "_tm"
        )
    )
    return pick.crossJoin(F.broadcast(truth)).select(
        F.col("_n").cast("bigint").alias("n_events"),
        F.round(F.col("b") * DPQ_BIN_CENTS / 100.0, 6).alias(
            "released_median"
        ),
        F.round(F.col("_tm") / 100.0, 6).alias("true_median"),
        F.round(
            F.abs(F.col("b") * DPQ_BIN_CENTS - F.col("_tm")) / 100.0, 6
        ).alias("abs_error"),
        F.col("noisy_u"),
    )


_DPQ_SQL = f"""
WITH c AS (
  SELECT COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS c FROM events
),
binned AS (SELECT c // {DPQ_BIN_CENTS} AS b FROM c),
hist AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM binned GROUP BY b),
rng AS (
  SELECT MIN(b) AS b0, MAX(b) AS b1, CAST(SUM(cnt) AS BIGINT) AS n FROM hist
),
bins AS (
  SELECT g.b, rng.n, COALESCE(h.cnt, 0) AS cnt
  FROM (SELECT unnest(generate_series((SELECT b0 FROM rng),
                                      (SELECT b1 FROM rng))) AS b) g
  LEFT JOIN hist h ON g.b = h.b, rng
),
ranked AS (
  SELECT b, n,
         COALESCE(CAST(SUM(cnt) OVER (
           ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS BIGINT), 0) AS below
  FROM bins
),
noisy AS (
  SELECT b, n,
         round(-abs(below - (n * {DPQ_Q_NUM}) // {DPQ_Q_DEN})
               - {DPQ_SCALE!r} * ln(-ln(
                 (('0x' || substr(md5('{DPQ_SALT}' || CAST(b AS VARCHAR)),
                    1, 13))::BIGINT + 0.5) / {float(2 ** _HASH_BITS)!r}
               )), 6) AS noisy_u
  FROM ranked
),
pick AS (SELECT * FROM noisy ORDER BY noisy_u DESC, b ASC LIMIT 1),
truth AS (
  SELECT round(quantile_cont(CAST(c AS DOUBLE), 0.5), 6) AS tm FROM c
)
SELECT pick.n AS n_events,
       round(pick.b * {DPQ_BIN_CENTS} / 100.0, 6) AS released_median,
       round(truth.tm / 100.0, 6) AS true_median,
       round(abs(pick.b * {DPQ_BIN_CENTS} - truth.tm) / 100.0, 6)
         AS abs_error,
       pick.noisy_u
FROM pick, truth
"""


T_CLOSE = 0.2  # max EMD between group and global sensitive distributions


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian 2007, public): the
    third check of the anonymity triad. k-anonymity bounds group
    SIZE and l-diversity bounds distinct sensitive VALUES, but a
    group whose balance-band distribution is wildly skewed vs the
    table still leaks ("everyone in this nation x segment is in the
    top band"). The check: Earth Mover's Distance between each QI
    group's sensitive-band distribution and the GLOBAL one, over the
    ordered band domain, must be <= t.

    For an ordered 1-D domain, EMD = sum_b |cumQ(b) - cumP(b)| /
    (|bands| - 1). Determinism: the cumulative sums are INTEGER
    window cumsums (exact regardless of accumulation order); each
    band contributes one double |n_cum/N_g - m_cum/N| cast to
    decimal before the final sum, so addition order cannot move the
    hash — no running float accumulation anywhere.

    Scale shape: one groupBy for the global band histogram (bounded
    by the band domain, ~110 rows), one for the per-group histogram
    (bounded by QI-domain x bands), a broadcast of the band domain to
    zero-fill absent bands, and windows whose partitions are at most
    |bands| rows. Nothing scales with the fact row count except the
    two initial aggs."""
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    banded = cust.select(
        "c_nationkey", "c_mktsegment", _sens_band(F.col("c_acctbal")).alias("band")
    )

    glob = banded.groupBy("band").agg(F.count(F.lit(1)).alias("m"))
    w_g = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    glob_cum = glob.select(
        "band",
        F.sum("m").over(w_g).alias("m_cum"),
    ).crossJoin(
        F.broadcast(
            glob.agg(
                F.sum("m").alias("n_total"), F.count(F.lit(1)).alias("n_bands")
            )
        )
    )

    grp_counts = banded.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("n")
    )
    groups = banded.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_n")
    )
    grid = (
        groups.crossJoin(F.broadcast(glob_cum.select("band")))
        .join(grp_counts, ["c_nationkey", "c_mktsegment", "band"], "left")
        .fillna({"n": 0})
    )
    w_q = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "band"
    ).rowsBetween(Window.unboundedPreceding, 0)
    terms = (
        grid.withColumn("n_cum", F.sum("n").over(w_q))
        .join(F.broadcast(glob_cum), "band")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_n",
            "n_bands",
            F.abs(
                F.col("n_cum").cast("double") / F.col("group_n").cast("double")
                - F.col("m_cum").cast("double") / F.col("n_total").cast("double")
            )
            .cast("decimal(28,12)")
            .alias("term"),
        )
    )
    return terms.groupBy("c_nationkey", "c_mktsegment", "group_n").agg(
        F.round(
            F.sum("term").cast("double")
            / (F.min("n_bands") - F.lit(1)).cast("double"),
            6,
        ).alias("emd"),
    ).select(
        "c_nationkey",
        "c_mktsegment",
        "group_n",
        "emd",
        (F.col("emd") <= F.lit(T_CLOSE)).cast("int").alias("t_ok"),
    )


_TCLOSE_SQL = f"""
WITH banded AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / {SENS_BAND}) AS BIGINT) AS band
  FROM customer
),
gh AS (SELECT band, count(*)::BIGINT AS m FROM banded GROUP BY band),
gtot AS (SELECT SUM(m)::BIGINT AS n_total, count(*)::BIGINT AS n_bands FROM gh),
gcum_t AS (
  SELECT band, SUM(m) OVER (ORDER BY band
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_cum
  FROM gh
),
groups AS (
  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS group_n
  FROM banded GROUP BY 1, 2
),
grp_counts AS (
  SELECT c_nationkey, c_mktsegment, band, count(*)::BIGINT AS n
  FROM banded GROUP BY 1, 2, 3
),
grid AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.group_n, b.band,
         coalesce(gc.n, 0) AS n
  FROM groups g
  CROSS JOIN (SELECT band FROM gcum_t) b
  LEFT JOIN grp_counts gc
    ON gc.c_nationkey = g.c_nationkey
   AND gc.c_mktsegment = g.c_mktsegment
   AND gc.band = b.band
),
terms AS (
  SELECT grid.c_nationkey, grid.c_mktsegment, grid.group_n,
         CAST(abs(
           CAST(SUM(n) OVER (PARTITION BY c_nationkey, c_mktsegment
                ORDER BY grid.band
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(group_n AS DOUBLE)
           - CAST(gcum.m_cum AS DOUBLE)
             / CAST((SELECT n_total FROM gtot) AS DOUBLE)
         ) AS DECIMAL(28,12)) AS term
  FROM grid JOIN gcum_t gcum ON grid.band = gcum.band
),
emd AS (
  SELECT c_nationkey, c_mktsegment, group_n,
         round(CAST(SUM(term) AS DOUBLE)
               / CAST((SELECT n_bands FROM gtot) - 1 AS DOUBLE), 6) AS emd
  FROM terms GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, group_n, emd,
       (CASE WHEN emd <= {T_CLOSE} THEN 1 ELSE 0 END) AS t_ok
FROM emd
"""




# Stability-based DP histogram over an UNKNOWN domain (Korolova et
# al. 2009 / Google's "stability histogram"): with a data-dependent
# domain (words), releasing which bins EXIST already leaks — a bin
# whose existence hinges on one user must be suppressed. Release
# noisy count n + Laplace(2/eps) only where it exceeds
# tau = 1 + (2/eps) * ln(1/(2*delta)); the released SET is then
# (eps, delta)-DP. Constants baked (transcendental): eps=1, delta=1e-6.
SH_SCALE = 2.0
SH_TAU = 27.244727  # 1 + (2/eps)*ln(1/(2*delta))
SH_SALT = "stablehist"


def q_dp_stable_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, noisy_count) for every vocabulary word whose noisy
    count clears the stability threshold — the private-vocabulary
    release. Same derandomized md5-Laplace as q_dp_noisy_counts (the
    release is reproducible, so the twin checks the full mechanism
    including the suppression set). The threshold compare uses the
    ROUNDED noisy count (4dp, the cutoff-reproducibility convention;
    SH_TAU is not a 4dp boundary). One tokenize pass + one
    vocabulary-keyed agg + map-side noise arithmetic — no extra
    shuffle over the count table."""
    from searchengine_spark.text.tokenizer import tokens_column

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens_column("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(SH_SALT), F.col("w")).cast("binary")), 1, 13
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**_HASH_BITS))
    v = u - F.lit(0.5)
    noise = (
        -F.lit(SH_SCALE)
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )
    return (
        counts.select(
            "w", F.round(F.col("n") + noise, 4).alias("noisy_count")
        )
        .filter(F.col("noisy_count") > F.lit(SH_TAU))
        .orderBy("w")
    )


QUERIES = {
    "privacy_t_closeness_audit": q_t_closeness_audit,
    "privacy_dp_stable_histogram": q_dp_stable_histogram,
    "privacy_dp_mean": q_dp_mean,
    "privacy_dp_quantile": q_dp_quantile,
    "privacy_rr_frequency": q_rr_frequency,
    "privacy_k_anonymity_audit": q_k_anonymity_audit,
    "privacy_k_anonymize_generalize": q_k_anonymize_generalize,
    "privacy_dp_noisy_counts": q_dp_noisy_counts,
    "privacy_dp_exponential_topk": q_dp_exponential_topk,
}
from searchengine_spark.text.tokenizer import sql_tokens_expr  # noqa: E402

_SH_SQL = f"""
WITH tok AS (
  SELECT unnest({sql_tokens_expr("text")}) AS w FROM documents
), counts AS (
  SELECT w, count(*)::BIGINT AS n FROM tok GROUP BY w
), seeded AS (
  SELECT w, n,
         (CAST(('0x' || substr(md5('{SH_SALT}' || w), 1, 13))
               AS BIGINT) + 0.5) / {float(2 ** _HASH_BITS)!r} - 0.5 AS v
  FROM counts
), noisy AS (
  SELECT w,
         round(n + (-{SH_SCALE!r}) * sign(v) * ln(1.0 - 2.0 * abs(v)), 4)
           AS noisy_count
  FROM seeded
)
SELECT w, noisy_count FROM noisy
WHERE noisy_count > {SH_TAU!r}
ORDER BY w
"""

ORACLES = {
    "privacy_dp_stable_histogram": _SH_SQL,
    "privacy_t_closeness_audit": _TCLOSE_SQL,
    "privacy_dp_mean": _DPM_SQL,
    "privacy_dp_quantile": _DPQ_SQL,
    "privacy_rr_frequency": _RR_SQL,
    "privacy_k_anonymity_audit": _AUDIT_SQL,
    "privacy_k_anonymize_generalize": _GENERALIZE_SQL,
    "privacy_dp_noisy_counts": _DP_SQL,
    "privacy_dp_exponential_topk": _EM_SQL,
}
