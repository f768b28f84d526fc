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


QUERIES = {"skew_salted_lang_stats": q_skew_salted_lang_stats}

ORACLES = {
    "skew_salted_lang_stats": """
        SELECT lang, COUNT(*) AS n_rows,
               CAST(SUM(CAST(n_chars AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM documents
        GROUP BY lang
    """,
}
