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


QUERIES = {
    "skew_salted_lang_stats": q_skew_salted_lang_stats,
    "skew_salted_join_stats": q_skew_salted_join_stats,
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
}
