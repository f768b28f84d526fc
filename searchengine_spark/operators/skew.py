"""Skew-aware aggregation: two-phase (salted) groupBy.

When a groupBy key has few distinct values or a heavy-hitter (lang
with 5 values over 100 TB, a viral doc_id, a stop-word-like term in
tf), all rows for a hot key land on one reducer. The classic fix:

    phase 1: groupBy(key, salt) — salt = hash(row) % N spreads each
             hot key over N reducers; partial aggregates combine
             map-side as usual.
    phase 2: groupBy(key) over the N partials — tiny input.

Only algebraic aggregates (count/sum/min/max, and avg as sum+count)
can be split this way; the helper takes explicit partial/final specs
so the decomposition is visible and testable. AQE's skew-join
splitting handles JOIN skew automatically; this helper is for
aggregation skew, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    *,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase aggregation over possibly-skewed keys.

    ``partial_aggs`` aggregate raw rows within (keys, salt);
    ``final_aggs`` combine the partials per keys. Column names must
    line up (partial output feeds final input).

    The salt hashes ALL row columns — deterministic per row content,
    so a task retry re-produces the same (keys, salt) assignment and
    no row is double-counted or lost (monotonically_increasing_id or
    rand would break exactly this). pmod keeps it in [0, n_salts).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_count_sum(
    df: DataFrame, keys: list[str], sum_col: str, *, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Convenience: count(*) + exact DECIMAL sum per key, skew-spread.

    Output: keys..., n_rows, total (double from exact decimal sum).
    """
    return salted_agg(
        df,
        keys,
        partial_aggs=[
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(sum_col).cast("decimal(28,2)")).alias("_s"),
        ],
        final_aggs=[
            F.sum("_n").alias("n_rows"),
            F.sum("_s").cast("double").alias("total"),
        ],
        n_salts=n_salts,
    )


def replicated_salt_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-proof equi-join: salt the FAT side, replicate the dim.

    A shuffle join on a hot key (5 event types over 100 TB) lands all
    rows for one key on one reducer regardless of cluster size. When
    the dim side is too large to broadcast (AQE's skew-split only
    rebalances partition-size skew AFTER a shuffle, and broadcast is
    off the table), the classic fix is:

        fact: + _salt = hash(row) % N      (spreads each hot key N ways)
        dim:  x N copies, one per _salt    (explode — map-side, no shuffle)
        join on (key, _salt)               (N reducers per hot key)

    Cost: the dim shuffle grows N-fold — the right trade exactly when
    |dim| << |fact|. The salt hashes all fact columns (deterministic
    per row content, retry-safe — same argument as salted_agg). The
    result set is row-identical to the plain join, proven by the
    hash-matched oracle query below.

    The join is hinted SHUFFLE_HASH so the demo exercises the salted
    shuffle topology even at test scale, where AQE would otherwise
    just broadcast the toy dim and hide the point.
    """
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)),
    )
    rep_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(
        rep_dim.hint("SHUFFLE_HASH"), on=[key, "_salt"], how="inner"
    ).drop("_salt")


# --------------------------------------------------------------- queries

def q_skew_salted_lang_stats(spark, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over documents.lang — a 5-value
    key, i.e. a genuinely skewed aggregation at any scale. The result
    is exact (algebraic decomposition + decimal sums), so it
    hash-matches the plain GROUP BY oracle — proving the salting
    changes the shuffle topology, not the answer."""
    from searchengine_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return salted_count_sum(docs, ["lang"], "n_chars")


def q_skew_salted_join_stats(spark, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join on events.event_type — a 5-value key, so
    an unsalted shuffle join tops out at 5 reducers at any scale. The
    dim (event_type -> chars weight) is derived deterministically so
    the DuckDB oracle can restate the whole thing; the aggregate after
    the join hash-matches the plain-join formulation, proving salting
    changed only the shuffle topology."""
    from searchengine_spark.io import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type"))
    )
    joined = replicated_salt_join(events, dim, "event_type")
    return joined.groupBy("event_type", "type_weight").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.col("type_weight") * F.sum(F.col("value").cast("decimal(28,2)")))
        .cast("double")
        .alias("weighted_value"),
    ).drop("type_weight")


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """One-row skew audit of a prospective join/groupBy key: the
    numbers a planner (or a human sizing a 1000-executor job) needs
    BEFORE shuffling 100 TB on ``key`` — distinct-key count, heaviest
    key's share, top-10 share, the sorted-rank Gini of the key-count
    distribution, and the p50/p99 per-key counts. max_share ~ 1/n_keys
    and gini ~ 0 mean a clean uniform key; max_share >> 1/n_keys says
    salt it (replicated_salt_join above) or expect one straggler task.

    Scale shape: ONE keyed count over the fact (the same shuffle the
    audited operation would do), then everything runs on the
    COUNT-VALUE HISTOGRAM (c -> number of keys with count c) — NOT on
    a per-key rank window. For `user_id` at 100 TB the count frame is
    ~1e9 keys, and an unpartitioned ROW_NUMBER over it is a
    single-task sort of a billion rows; the histogram instead has at
    most sqrt(2*n_rows) distinct values (the c's are distinct
    positive integers summing to n_rows), so its one ordered prefix
    window is over a provably tiny frame (~1.4e6 rows at 1e12
    events). Per-key ranks are never materialized: keys sharing a
    count c occupy a CONSECUTIVE rank run [off_c+1, off_c+n_c] in the
    ascending (count, key) order and contribute identically, so
    sum(i*c) folds to sum_c c*(n_c*off_c + n_c*(n_c+1)/2) — exact
    integers, the key tiebreak provably irrelevant. top10_share is a
    limit-10 (TakeOrderedAndProject) over the count frame; p50/p99
    are frequency-weighted percentiles over the histogram. Everything
    is integer arithmetic until the final round(…, 6), so the frame
    hash-checks exactly against the oracle's plain rank-window
    formulation (sum(i*c) fits int64 to ~1e9 keys x ~1e12 rows; use
    decimal(38,0) accumulators beyond that — same expressions).
    The Gini stays the sorted-rank formulation
    G = (2*sum(i*c_i) - (n+1)*sum(c)) / (n*sum(c))."""
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
    hist = counts.groupBy("c").agg(F.count(F.lit(1)).alias("n_c"))
    off_w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    hist_off = hist.withColumn(
        "_offc", F.coalesce(F.sum("n_c").over(off_w), F.lit(0))
    )
    stats = hist_off.agg(
        F.sum("n_c").alias("n_keys"),
        F.sum(F.col("c") * F.col("n_c")).alias("n_rows"),
        F.max("c").alias("max_count"),
        F.sum(
            F.col("c")
            * (
                F.col("n_c") * F.col("_offc")
                + F.expr("n_c * (n_c + 1) div 2")
            )
        ).alias("_ic"),
        F.percentile(F.col("c"), F.lit(0.5), F.col("n_c")).alias("_p50"),
        F.percentile(F.col("c"), F.lit(0.99), F.col("n_c")).alias("_p99"),
    )
    t10 = (
        counts.orderBy(F.desc("c"), F.desc(key))
        .limit(10)
        .agg(F.sum("c").alias("_t10"))
    )
    return stats.crossJoin(F.broadcast(t10)).select(
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("max_count").cast("bigint").alias("max_count"),
        F.round(F.col("max_count") / F.col("n_rows"), 6).alias("max_share"),
        F.round(F.col("_t10") / F.col("n_rows"), 6).alias("top10_share"),
        F.round(
            (2 * F.col("_ic") - (F.col("n_keys") + 1) * F.col("n_rows"))
            / (F.col("n_keys") * F.col("n_rows")),
            6,
        ).alias("gini"),
        F.round(F.col("_p50"), 6).alias("p50_count"),
        F.round(F.col("_p99"), 6).alias("p99_count"),
    )


def q_skew_key_profile(spark, sf_dir: str) -> DataFrame:
    """Key-skew audit of events.user_id — the join key every
    sessionization/attribution/funnel query in relational/events.py
    shuffles on."""
    from searchengine_spark.io import load_table

    return key_skew_profile(load_table(spark, sf_dir, "events"), "user_id")


QUERIES = {
    "skew_salted_lang_stats": q_skew_salted_lang_stats,
    "skew_salted_join_stats": q_skew_salted_join_stats,
    "skew_key_profile": q_skew_key_profile,
}

ORACLES = {
    "skew_salted_lang_stats": """
        SELECT lang, COUNT(*) AS n_rows,
               CAST(SUM(CAST(n_chars AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM documents
        GROUP BY lang
    """,
    "skew_salted_join_stats": """
        WITH dim AS (
          SELECT DISTINCT event_type, length(event_type) AS type_weight
          FROM events
        )
        SELECT e.event_type, COUNT(*) AS n_rows,
               CAST(d.type_weight * SUM(CAST(e.value AS DECIMAL(28,2)))
                    AS DOUBLE) AS weighted_value
        FROM events e JOIN dim d ON e.event_type = d.event_type
        GROUP BY e.event_type, d.type_weight
    """,
    "skew_key_profile": """
        WITH counts AS (
          SELECT user_id, COUNT(*)::BIGINT AS c FROM events GROUP BY user_id
        ),
        ranked AS (
          SELECT c,
                 ROW_NUMBER() OVER (ORDER BY c ASC, user_id ASC) AS i,
                 ROW_NUMBER() OVER (ORDER BY c DESC, user_id DESC) AS j
          FROM counts
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(MAX(c) AS BIGINT) AS max_count,
               ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
                 AS max_share,
               ROUND(CAST(SUM(CASE WHEN j <= 10 THEN c ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(c) AS DOUBLE), 6) AS top10_share,
               ROUND(CAST(2 * SUM(i * c) - (COUNT(*) + 1) * SUM(c) AS DOUBLE)
                     / CAST(COUNT(*) * SUM(c) AS DOUBLE), 6) AS gini,
               ROUND(quantile_cont(c, 0.5), 6) AS p50_count,
               ROUND(quantile_cont(c, 0.99), 6) AS p99_count
        FROM ranked
    """,
}
