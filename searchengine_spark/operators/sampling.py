"""Deterministic sampling and dataset splitting.

The reference's only sampling op is a head-fraction slice
(nltksearchv1.py:41, `df.slice(int(-0.5*len(df)))`) — deterministic
but order-dependent, which breaks on any distributed scan whose file
order changes. A 100 TB training pipeline needs splits that are:

- deterministic per RECORD (not per row position): a doc lands in the
  same split on every run, on any cluster layout, after any
  repartition;
- stable under appends: new records don't reshuffle old assignments
  (hash-based, not rank/ntile-based);
- engine-reproducible: md5-based buckets, so the DuckDB oracle
  computes the exact same assignment (same trick as operators/dedup).

`spark.DataFrame.sample` satisfies none of these (seeded per
partition — results change with partitioning), so it is the wrong
tool for train/test splits; it remains the right tool for cheap
approximate profiling where stability doesn't matter.

Scale shape: pure narrow projection + filter — no shuffle, no state;
the bucket expression pushes nothing to the scan but evaluates
per-row in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(col: Column, *, n_buckets: int = N_BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in [0, n_buckets) from a column's string
    form: first 60 bits of md5, mod n_buckets. DuckDB twin:
    ('0x' || substr(md5(salt || CAST(x AS VARCHAR)), 1, 15))::BIGINT % n."""
    s = F.concat(F.lit(salt), col.cast("string"))
    h = F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(n_buckets))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, chosen by record-content hash: stable
    across runs, partitionings, and appends."""
    cutoff = int(fraction * N_BUCKETS)
    return df.filter(hash_bucket(F.col(id_col), salt=salt) < cutoff)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    *,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column ('train'/'val'/'test') by hashed id.

    The salt namespaces the assignment: a different salt gives an
    independent split without touching the data. Ranges are
    [0, val) -> val, [val, val+test) -> test, rest -> train.
    """
    b = hash_bucket(F.col(id_col), salt=salt)
    val_hi = int(val_fraction * N_BUCKETS)
    test_hi = val_hi + int(test_fraction * N_BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def leakage_safe_split(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    *,
    salt: str = "lsplit",
) -> DataFrame:
    """Train/val/test split at the duplicate-CLUSTER level: every doc
    in a near-dup cluster gets its cluster representative's split, so
    a document can never sit in train while its near-duplicate sits
    in test (the classic eval-leakage hole a doc-level hash split
    leaves open). ``components`` is (doc_id, component) from
    `dedup.connected_components`; singletons (absent from the match
    graph) represent themselves."""
    rep = docs.select(id_col).join(
        components.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).select(
        id_col, F.coalesce(F.col("component"), F.col(id_col)).alias("rep")
    )
    return train_val_test_split(rep, "rep", salt=salt)


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level split over documents: LSH near-dup components
    (the driver-checked cluster query) decide the unit of
    assignment. The oracle recomputes components with the recursive
    CTE and applies the identical hash split to the representative."""
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.dedup import q_duplicate_clusters

    docs = load_table(spark, sf_dir, "documents")
    comps = q_duplicate_clusters(spark, sf_dir)
    return leakage_safe_split(docs, comps).orderBy("doc_id")


def sample_per_group_quota(
    df: DataFrame,
    group_col: str,
    id_col: str,
    quota: int,
    *,
    salt: str = "quota",
) -> DataFrame:
    """At most ``quota`` rows per group, chosen uniformly and
    DETERMINISTICALLY by record-hash rank (source balancing: cap
    over-represented sources without biasing toward scan order).

    Rank is row_number over (hash_bucket, id) within the group — the
    id tiebreak makes the pick total-ordered, so the same records
    survive on every run/partitioning; a different salt draws an
    independent sample.

    Scale shape: the per-group rank goes through
    `distrank.distributed_rank` — the uniform hash_bucket value is
    its own monotone bucket (quantized 16:1), so a giant group's sort
    spreads over ~625 tasks instead of one — and ``quota`` prunes
    every bucket whose exclusive offset already reaches it BEFORE the
    window, so the surviving work is O(groups x quota) rows, not the
    corpus. Row-identical to the plain per-group window the DuckDB
    oracle states.
    """
    from searchengine_spark.operators.distrank import distributed_rank

    ranked = distributed_rank(
        df.withColumn("_hb", hash_bucket(F.col(id_col), salt=salt)),
        [group_col],
        [F.asc("_hb"), F.asc(id_col)],
        F.expr("_hb div 16"),
        rank_name="_rk",
        max_rank=quota,
    )
    return ranked.filter(F.col("_rk") <= quota).drop("_rk", "_hb")


def weighted_pps_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    *,
    salt: str = "pps",
) -> DataFrame:
    """Systematic PPS sample: inclusion probability proportional to
    weight (min(1, n*w/W)), n total selections, EXACT integer
    arithmetic end to end — no float ordering, so the DuckDB oracle
    reproduces the selection bit-for-bit.

    Method (Madow systematic sampling over a hashed order): lay the
    rows on a number line of cumulative integer weight [0, W); place n
    evenly spaced selection points (2k+1)*W/(2n); a row is selected
    iff its weight interval [cum_prev, cum) contains a point, i.e.

        g(cum) > g(cum_prev)   where   g(c) = (2*n*c + W) DIV (2*W)

    `n_hits` = g(cum) - g(cum_prev) counts points in the interval
    (>1 only for rows heavier than the W/n stride — useful as a
    resampling multiplicity). The traversal order is (hash-bucket of
    id, id): content-derived, so the sample is stable across runs,
    partitionings, and appends-that-don't-change-W, and uncorrelated
    with scan order (the failure mode of the reference's head-slice,
    nltksearchv1.py:41).

    Scale shape — a distributed prefix sum, NOT a global sort:
      1. per-bucket weight totals (one small agg: N_BUCKETS rows);
      2. exclusive running offsets over those totals (a window over
         N_BUCKETS rows — the only single-partition step, O(10^4)
         regardless of data size);
      3. broadcast offsets back; within-bucket prefix sums shuffle on
         the bucket key only.
    Weights must be positive integers; rows with w <= 0 or NULL are
    excluded. 2*n*W must fit int64 (at 100 TB-of-chars scale, switch
    the two g() operands to decimal(38,0) — same expressions).
    """
    from pyspark.sql import Window

    w_int = F.col(weight_col).cast("bigint")
    rows = (
        df.select(F.col(id_col), w_int.alias("_w"))
        .filter(F.col("_w") > 0)
        .withColumn("_b", hash_bucket(F.col(id_col), salt=salt))
    )
    totals = rows.groupBy("_b").agg(F.sum("_w").alias("_bw"))
    off_win = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bw").over(off_win), F.lit(0))
    ).select("_b", "_off")
    grand = totals.agg(F.sum("_bw").alias("_wtot"))

    in_win = (
        Window.partitionBy("_b")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_c0", F.col("_off") + F.coalesce(F.sum("_w").over(in_win), F.lit(0))
        )
        .withColumn("_c1", F.col("_c0") + F.col("_w"))
        .crossJoin(F.broadcast(grand))
    )
    g0 = F.expr(f"(2*{n}*_c0 + _wtot) DIV (2*_wtot)")
    g1 = F.expr(f"(2*{n}*_c1 + _wtot) DIV (2*_wtot)")
    return (
        cum.withColumn("n_hits", (g1 - g0).cast("int"))
        .filter(F.col("n_hits") > 0)
        .select(F.col(id_col), F.col("_w").alias("weight"), "n_hits")
    )


def _bucket_sql(expr: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5('{salt}' || CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"
        f" % {N_BUCKETS})"
    )


def q_sample_documents(spark, sf_dir: str) -> DataFrame:
    """10% deterministic sample of documents (ids + langs only)."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.10).select("doc_id", "lang")


def q_split_distribution(spark, sf_dir: str) -> DataFrame:
    """Split-assignment histogram per language: proves assignment is
    deterministic AND close to the requested 80/10/10."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        train_val_test_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


QUOTA_PER_SOURCE = 30


def q_source_quota(spark, sf_dir: str) -> DataFrame:
    """Cap each source at QUOTA_PER_SOURCE docs, hash-uniformly."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return sample_per_group_quota(docs, "source", "doc_id", QUOTA_PER_SOURCE).select(
        "doc_id", "source"
    )


PPS_N = 200


def q_weighted_pps(spark, sf_dir: str) -> DataFrame:
    """~200-point PPS sample of documents weighted by length: long
    docs proportionally more likely, giant docs capped at inclusion
    (n_hits counts their extra selection points)."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return weighted_pps_sample(docs, "doc_id", "n_chars", PPS_N)


# Efraimidis–Spirakis (2006) weighted reservoir: each row draws a
# uniform u and keys on u^(1/w); the n LARGEST keys are an exact
# weighted sample WITHOUT replacement. Complements weighted_pps_sample
# (systematic/Madow, inclusion-probability design): A-ES is the
# order-free textbook WR-without-replacement, needs no prefix sum at
# all, and is what you reach for when the sample must stay exactly n
# rows under streaming appends (the key is per-record, so merging two
# reservoirs = top-n of their union).
AES_N = 150
AES_SALT = "aes"
_AES_HASH_BITS = 52  # 13 hex digits, same as the DSIR/privacy Gumbel


def weighted_reservoir_topn(
    df: DataFrame, id_col: str, weight_col: str, n: int, *, salt: str = AES_SALT
) -> DataFrame:
    """Top-n rows by the A-ES key, derandomized with the repo's seeded
    md5 uniform so the exact selected SET is oracle-checked.

    Ranking uses ln(u)/w (monotone in u^(1/w); ln(u) < 0 so heavier
    weights pull the key toward 0 = larger): one ln on identical
    inputs per engine, one division, then ROUND BEFORE the ordering
    with the id tiebreak — the repo's float discipline for
    cross-engine top-k. Rounded to 12 (not the usual 6): heavy
    weights compress keys toward 0, and at 6 decimals the whole top
    of the order collapses into rounding ties, degrading the weighted
    sample to an id-order pick; 12 decimals still absorbs any
    cross-engine ln() ulp (~1e-20 at these magnitudes) with nine
    orders of margin. Scale shape: pure map + TakeOrderedAndProject;
    no shuffle beyond the top-n reduction; merging shard-local top-n
    frames is top-n again (mergeable by construction)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary")
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**_AES_HASH_BITS))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 12)
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col).cast("bigint").alias("weight"),
                key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc(id_col))
        .limit(n)
    )


def q_aes_weighted_topn(spark, sf_dir: str) -> DataFrame:
    """~150-row A-ES weighted-without-replacement sample of documents
    by length."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return weighted_reservoir_topn(docs, "doc_id", "n_chars", AES_N).orderBy(
        F.desc("es_key"), F.asc("doc_id")
    )


# Exact stratified allocation as a RATIONAL num/den so the per-group
# keep count ceil(n_g * num / den) is integer arithmetic in both
# engines — float fractions (0.2 * n) sit ulps off integers and flip
# ceil() per-engine.
STRAT_NUM, STRAT_DEN = 1, 5  # 20% per stratum
STRAT_SALT = "strat"


def stratified_exact_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    *,
    num: int = STRAT_NUM,
    den: int = STRAT_DEN,
    salt: str = STRAT_SALT,
) -> DataFrame:
    """EXACTLY ceil(n_g·num/den) rows per stratum, chosen by md5 rank
    — proportional allocation with deterministic membership. The
    distinction from `deterministic_sample` per group: the hash-
    threshold form hits the fraction only in EXPECTATION (a small or
    unlucky stratum can land far off); rank-based allocation is exact
    per stratum, which is what a train-set composition contract
    needs.

    Scale shape: the per-stratum rank goes through
    `distrank.distributed_rank`, NOT a naive per-stratum window (with
    ~5 language strata at 100 TB each window partition would be ~1/5
    of the corpus sorted in one task). The md5 rank key bucketizes
    naturally — its top bits ARE a uniform monotone bucket (h DIV
    2^48 -> 4096 equal-width buckets) — and the exact per-stratum
    keep count ceil(n*num/den) prunes every bucket whose exclusive
    offset already exceeds it BEFORE the window, so only ~num/den of
    each stratum is ever sorted (in ~4096-way parallel). Rank- and
    row-identical to the plain window the DuckDB oracle states."""
    from searchengine_spark.operators.distrank import distributed_rank

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    keep = F.expr(f"(_gn * {num} + {den - 1}) div {den}")
    ranked = distributed_rank(
        df.withColumn("_h", h),
        [stratum_col],
        [F.asc("_h"), F.asc(id_col)],
        F.expr(f"_h div {1 << 48}"),
        rank_name="_r",
        max_rank=keep,
        group_count_name="_n",
    )
    return (
        ranked.filter(F.col("_r") <= F.expr(f"(_n * {num} + {den - 1}) div {den}"))
        .drop("_r", "_n", "_h")
    )


def q_stratified_exact(spark, sf_dir: str) -> DataFrame:
    """Exact 20%-per-language stratified sample of documents."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_exact_sample(docs, "lang", "doc_id")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )




K_FOLDS = 5
KFOLD_SALT = "fold"


def kfold_assign(df: DataFrame, id_col: str, *, k: int = K_FOLDS,
                 salt: str = KFOLD_SALT) -> DataFrame:
    """Adds `fold` in [0, k) by hashed id — the cross-validation
    counterpart of train_val_test_split: stable under repartition and
    append, and a different salt yields an independent fold system."""
    return df.withColumn("fold", hash_bucket(F.col(id_col), n_buckets=k, salt=salt))


def q_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold size + stratification audit for the k-fold assignment
    on documents: each fold's doc count, its per-source chi-square
    balance statistic vs the source's global share (expected count =
    source_total / k), and the count of the fold's worst source.

    A skewed fold means the hash is correlated with a stratum — the
    audit every CV split should ship with. One keyed agg to
    (fold, source) cells, marginals via windows over the k x |sources|
    cell table (domain-bounded), chi-square from exact integer counts.
    """
    from pyspark.sql import Window

    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    cells = (
        kfold_assign(docs.select("doc_id", "source"), "doc_id")
        .groupBy("fold", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_src = Window.partitionBy("source")
    with_exp = cells.withColumn(
        "exp",
        F.sum("n").over(w_src).cast("double") / F.lit(float(K_FOLDS)),
    ).withColumn(
        "chi_term",
        (F.col("n").cast("double") - F.col("exp"))
        * (F.col("n").cast("double") - F.col("exp"))
        / F.col("exp"),
    )
    return (
        with_exp.groupBy("fold")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
            F.round(
                F.sum(F.col("chi_term").cast("decimal(28,6)")).cast("double"),
                6,
            ).alias("chi2_balance"),
            F.max(F.struct(F.col("chi_term"), F.col("source")))["source"].alias(
                "worst_source"
            ),
        )
        .orderBy("fold")
    )


QUERIES = {
    "sample_kfold_balance": q_kfold_balance,
    "sample_aes_weighted_topn": q_aes_weighted_topn,
    "sample_stratified_exact": q_stratified_exact,
    "split_leakage_safe": q_leakage_safe_split,
    "sample_documents_10pct": q_sample_documents,
    "split_train_val_test": q_split_distribution,
    "sample_source_quota": q_source_quota,
    "sample_weighted_pps": q_weighted_pps,
}

from searchengine_spark.operators.dedup import _CLUSTERS_SQL as _DEDUP_CLUSTERS_SQL  # noqa: E402

# Interpolates KFOLD_SALT/K_FOLDS so changing either constant keeps
# the oracle synchronized with kfold_assign (round-10 ADVICE).
_KFOLD_SQL = f"""
WITH cells AS (
  SELECT (('0x' || substr(md5('{KFOLD_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {K_FOLDS}) AS fold, source, count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2
), exp_ AS (
  SELECT fold, source, n,
         (CAST(n AS DOUBLE) - CAST(SUM(n) OVER (PARTITION BY source) AS DOUBLE) / {float(K_FOLDS)!r})
         * (CAST(n AS DOUBLE) - CAST(SUM(n) OVER (PARTITION BY source) AS DOUBLE) / {float(K_FOLDS)!r})
         / (CAST(SUM(n) OVER (PARTITION BY source) AS DOUBLE) / {float(K_FOLDS)!r}) AS chi_term
  FROM cells
)
SELECT fold, CAST(SUM(n) AS BIGINT) AS n_docs,
       count(*)::BIGINT AS n_sources,
       round(CAST(SUM(CAST(chi_term AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS chi2_balance,
       max(struct_pack(c := chi_term, s := source)).s AS worst_source
FROM exp_
GROUP BY fold ORDER BY fold
"""

ORACLES = {
    "sample_kfold_balance": _KFOLD_SQL,
    "sample_aes_weighted_topn": f"""
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               round(ln((('0x' || substr(md5('{AES_SALT}'
                      || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                    / {float(2**_AES_HASH_BITS)!r})
                    / CAST(n_chars AS DOUBLE), 12) AS es_key
        FROM documents
        WHERE n_chars > 0
        ORDER BY es_key DESC, doc_id ASC
        LIMIT {AES_N}
    """,
    "sample_stratified_exact": f"""
        WITH ranked AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substr(md5('{STRAT_SALT}'
                             || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT ASC,
                            doc_id ASC
                 ) AS r,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM documents
        )
        SELECT doc_id, lang FROM ranked
        WHERE r <= (n * {STRAT_NUM} + {STRAT_DEN - 1}) // {STRAT_DEN}
        ORDER BY doc_id
    """,
    "split_leakage_safe": f"""
        SELECT d.doc_id,
               COALESCE(c.component, d.doc_id) AS rep,
               CASE
                 WHEN {_bucket_sql("COALESCE(c.component, d.doc_id)", "lsplit")} < {int(0.1 * N_BUCKETS)} THEN 'val'
                 WHEN {_bucket_sql("COALESCE(c.component, d.doc_id)", "lsplit")} < {2 * int(0.1 * N_BUCKETS)} THEN 'test'
                 ELSE 'train'
               END AS split
        FROM documents d
        LEFT JOIN ({_DEDUP_CLUSTERS_SQL}) c ON d.doc_id = c.doc_id
        ORDER BY d.doc_id
    """,
    "sample_documents_10pct": f"""
        SELECT doc_id, lang FROM documents
        WHERE {_bucket_sql("doc_id", "")} < {int(0.10 * N_BUCKETS)}
    """,
    "sample_source_quota": f"""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY {_bucket_sql("doc_id", "quota")} ASC, doc_id ASC
                 ) AS rk
          FROM documents
        ) WHERE rk <= {QUOTA_PER_SOURCE}
    """,
    "split_train_val_test": f"""
        SELECT CASE
                 WHEN {_bucket_sql("doc_id", "split")} < {int(0.1 * N_BUCKETS)} THEN 'val'
                 WHEN {_bucket_sql("doc_id", "split")} < {2 * int(0.1 * N_BUCKETS)} THEN 'test'
                 ELSE 'train'
               END AS split,
               lang, COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
    """,
    "sample_weighted_pps": f"""
        WITH rows0 AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                 {_bucket_sql("doc_id", "pps")} AS b
          FROM documents WHERE n_chars > 0
        ),
        cum AS (
          SELECT doc_id, w,
                 COALESCE(SUM(w) OVER (
                   ORDER BY b, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS c0,
                 -- NB: not "AS W" — DuckDB identifiers are
                 -- case-insensitive, so W would collide with w
                 SUM(w) OVER () AS wt
          FROM rows0
        )
        SELECT doc_id, w AS weight,
               CAST((2*{PPS_N}*(c0 + w) + wt) // (2*wt)
                    - (2*{PPS_N}*c0 + wt) // (2*wt) AS INT) AS n_hits
        FROM cum
        WHERE (2*{PPS_N}*(c0 + w) + wt) // (2*wt) > (2*{PPS_N}*c0 + wt) // (2*wt)
    """,
}
