"""Training-mixture resampling — re-balance corpus composition to
target domain weights (the "data mixing" stage of an LLM pipeline,
cf. Gopher/LLaMA mixture tables).

Given target weights w_g per group (source/domain/language), keep
the LARGEST subsample whose composition matches the weights without
replacement: scale = min_g(count_g / w_g); per-group acceptance
rate r_g = scale * w_g / count_g (the argmin group keeps ~everything,
over-represented groups are down-sampled).

Row selection reuses the md5 hash-bucket from operators/sampling —
per-record deterministic, stable under repartition/append, and
bit-reproducible in DuckDB, so the exact surviving row SET (not just
its size) is oracle-checked.

Scale shape: one tiny groupBy (|groups| rows) -> scalar min ->
broadcast the |groups|-row rate table back onto the scan -> filter.
The corpus itself is never shuffled; the filter runs in whole-stage
codegen at scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.sampling import N_BUCKETS, _bucket_sql, hash_bucket

# Demo mixture over the documents `source` column: three weight
# tiers. Deterministic dict order (src0..src19).
SOURCE_WEIGHTS: dict[str, float] = {f"src{i}": float(1 + i % 3) for i in range(20)}
MIX_SALT = "mixture"


def mixture_resample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    id_col: str,
    *,
    salt: str = MIX_SALT,
) -> DataFrame:
    """Down-sample each group so surviving composition ~ weights.
    Groups absent from `weights` are dropped (inner join); the
    selection hash is salted so mixtures are independent of other
    sampling decisions on the same ids."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        list(weights.items()), f"{group_col} string, wt double"
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    joined = counts.join(wdf, group_col)
    scale = joined.agg(F.min(F.col("n") / F.col("wt")).alias("scale"))
    rates = joined.crossJoin(F.broadcast(scale)).select(
        group_col,
        F.floor(F.col("scale") * F.col("wt") / F.col("n") * N_BUCKETS)
        .cast("bigint")
        .alias("cutoff"),
    )
    return df.join(F.broadcast(rates), group_col).filter(
        hash_bucket(F.col(id_col), salt=salt) < F.col("cutoff")
    )


def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mixture_resample(
        docs, "source", SOURCE_WEIGHTS, "doc_id"
    ).select("doc_id", "source")


def _weights_values_sql() -> str:
    return ", ".join(f"('{k}', {v})" for k, v in SOURCE_WEIGHTS.items())


# ------------------------------------- temperature (alpha) sampling

ALPHA = 0.3  # mT5's temperature: w_g ∝ p_g^alpha, alpha<1 lifts the tail
TEMP_SALT = "mixtemp"


def temperature_resample(
    df: DataFrame, group_col: str, id_col: str, *, alpha: float = ALPHA
) -> DataFrame:
    """Temperature-scaled mixing (Xue et al. 2021, mT5 §3.2; the
    GPT-3 data-mixing rule): target weights are DERIVED from the
    corpus itself as p_g^alpha, so over-represented groups (here:
    English at ~40% of documents) are down-sampled toward the
    flattened distribution instead of toward hand-picked weights.

    Same scale shape as mixture_resample: |groups|-row aggregates +
    a broadcast rate table back onto the scan. Cross-engine float
    discipline: the only transcendental (pow) is rounded to 6
    decimals before entering the rate arithmetic, and every
    subsequent double op is mirrored in the same order by the twin
    (see memory: round-6 float discipline)."""
    spark = df.sparkSession
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("tot"))
    w = counts.crossJoin(F.broadcast(total)).select(
        group_col,
        "n",
        F.round(F.pow(F.col("n") / F.col("tot"), F.lit(alpha)), 6).alias("wt"),
    )
    scale = w.agg(F.min(F.col("n") / F.col("wt")).alias("scale"))
    rates = w.crossJoin(F.broadcast(scale)).select(
        group_col,
        F.floor(F.col("scale") * F.col("wt") / F.col("n") * N_BUCKETS)
        .cast("bigint")
        .alias("cutoff"),
    )
    return df.join(F.broadcast(rates), group_col).filter(
        hash_bucket(F.col(id_col), salt=TEMP_SALT) < F.col("cutoff")
    )


def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return temperature_resample(docs, "lang", "doc_id").select(
        "doc_id", "lang"
    )


def curriculum_interleave(
    df: DataFrame, group_col: str, order_col: str, id_col: str
) -> DataFrame:
    """(id, group, curriculum_rank, interleave_key): a GLOBAL training
    order that (a) runs each source's documents in curriculum order
    (``order_col`` descending — e.g. longest/highest-quality first)
    and (b) round-robins across sources so no training stretch is
    single-source — the standard curriculum + source-interleave
    schedule, WITHOUT the global sort that naively produces it.

    interleave_key = curriculum_rank * n_groups + group_index is a
    bijection into the target order: sorting by it round-robins
    rank-0 docs of every source, then rank-1, and so on. Computing it
    needs only per-GROUP windows (the same shuffle as any per-source
    ranking) plus a broadcast |groups|-row index table — at 100 TB
    the trainer's loader sorts shards by the key it already has,
    and nothing ever sorted the corpus globally.
    """
    from pyspark.sql import Window

    groups = df.select(group_col).distinct()
    gw = Window.orderBy(group_col)  # |groups| rows — constant-size
    gidx = groups.withColumn("_gidx", F.row_number().over(gw) - 1)
    n_groups = gidx.agg(F.count(F.lit(1)).alias("_ng"))
    per = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        df.withColumn("curriculum_rank", (F.row_number().over(per) - 1).cast("bigint"))
        .join(F.broadcast(gidx), group_col)
        .crossJoin(F.broadcast(n_groups))
        .select(
            id_col,
            group_col,
            "curriculum_rank",
            (F.col("curriculum_rank") * F.col("_ng") + F.col("_gidx"))
            .cast("bigint")
            .alias("interleave_key"),
        )
    )


def q_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum (longest-first) + source-interleaved global training
    order over documents — every doc gets its position in the schedule
    without a corpus-wide sort."""
    docs = load_table(spark, sf_dir, "documents")
    return curriculum_interleave(docs, "source", "n_chars", "doc_id").orderBy(
        "doc_id"
    )


QUERIES = {
    "mix_resample_by_source": q_mixture_resample,
    "mix_temperature_resample": q_temperature_resample,
    "mix_curriculum_interleave": q_curriculum_interleave,
}

ORACLES = {
    "mix_resample_by_source": f"""
        WITH w(source, wt) AS (VALUES {_weights_values_sql()}),
        counts AS (
          SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ),
        j AS (SELECT c.source, c.n, w.wt FROM counts c JOIN w USING (source)),
        s AS (SELECT MIN(n / wt) AS scale FROM j),
        rates AS (
          SELECT source, CAST(floor(s.scale * wt / n * {N_BUCKETS}) AS BIGINT) AS cutoff
          FROM j, s
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates r USING (source)
        WHERE {_bucket_sql("d.doc_id", MIX_SALT)} < r.cutoff
    """,
    "mix_temperature_resample": f"""
        WITH counts AS (
          SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
        ),
        t AS (SELECT SUM(n) AS tot FROM counts),
        w AS (
          SELECT lang, n, round(pow(n / t.tot, {ALPHA}), 6) AS wt
          FROM counts, t
        ),
        s AS (SELECT MIN(n / wt) AS scale FROM w),
        rates AS (
          SELECT lang, CAST(floor(s.scale * wt / n * {N_BUCKETS}) AS BIGINT) AS cutoff
          FROM w, s
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN rates r USING (lang)
        WHERE {_bucket_sql("d.doc_id", TEMP_SALT)} < r.cutoff
    """,
    "mix_curriculum_interleave": """
        WITH gidx AS (
          SELECT source,
                 ROW_NUMBER() OVER (ORDER BY source) - 1 AS gi
          FROM (SELECT DISTINCT source FROM documents)
        ),
        ng AS (SELECT COUNT(*) AS n FROM gidx),
        ranked AS (
          SELECT doc_id, source,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
                 ) - 1 AS BIGINT) AS curriculum_rank
          FROM documents
        )
        SELECT r.doc_id, r.source, r.curriculum_rank,
               CAST(r.curriculum_rank * ng.n + g.gi AS BIGINT) AS interleave_key
        FROM ranked r JOIN gidx g USING (source), ng
        ORDER BY r.doc_id
    """,
}
