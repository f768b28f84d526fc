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
    rank-0 docs of every source, then rank-1, and so on. The trainer's
    loader sorts shards by the key it already has — nothing ever sorts
    the corpus globally.

    The per-source rank itself is NOT a naive per-group window (with
    O(10) sources at 100 TB each window partition would be ~1/10 of
    the corpus sorted in ONE task): it goes through
    `distrank.distributed_rank` — value-range buckets on ``order_col``
    (one 1-row min/max broadcast fold), per-(source, bucket) counts,
    exclusive offsets over the tiny count frame, then a window keyed
    on (source, bucket) so each source's sort spreads over ~4096
    tasks. Rank-identical to ROW_NUMBER() OVER (PARTITION BY source
    ORDER BY order_col DESC, id ASC) — the DuckDB oracle states the
    plain window.
    """
    from pyspark.sql import Window

    from searchengine_spark.operators.distrank import (
        distributed_rank,
        range_bucket,
    )

    groups = df.select(group_col).distinct()
    gw = Window.orderBy(group_col)  # |groups| rows — constant-size
    gidx = groups.withColumn("_gidx", F.row_number().over(gw) - 1)
    n_groups = gidx.agg(F.count(F.lit(1)).alias("_ng"))
    ext, bucket = range_bucket(df, order_col, descending=True)
    ranked = distributed_rank(
        ext,
        [group_col],
        [F.desc(order_col), F.asc(id_col)],
        bucket,
        rank_name="_crk",
    )
    return (
        ranked.withColumn(
            "curriculum_rank", (F.col("_crk") - 1).cast("bigint")
        )
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


# ------------------------------------------ leave-one-source-out


def q_loo_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out corpus ablation — the cheap relational
    first pass of a dataset-ablation study: for every source, what
    the corpus profile (here: mean and std of doc length) becomes
    WITHOUT it, and the source's influence (loo_mean - global mean).
    A source with large positive influence is dragging the profile
    down; rank by |influence| to pick ablation candidates BEFORE
    paying for training runs.

    The trick that makes it one pass: leave-one-out aggregates are
    algebraic — loo_sum = global_sum - source_sum etc. — so one
    per-source aggregate plus a broadcast 1-row global fold yields
    every ablation simultaneously; nothing is recomputed per source.
    Integer sums (chars, chars^2) end-to-end; floats only in the
    final per-row formulas, rounded to 6."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("n_chars").cast("bigint")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
    )
    glob = per_src.agg(
        F.sum("n").alias("gn"), F.sum("s1").alias("gs1"), F.sum("s2").alias("gs2")
    )
    j = per_src.crossJoin(F.broadcast(glob))
    ln = (F.col("gn") - F.col("n")).cast("double")
    ls1 = (F.col("gs1") - F.col("s1")).cast("double")
    ls2 = (F.col("gs2") - F.col("s2")).cast("double")
    loo_mean = ls1 / ln
    gmean = F.col("gs1").cast("double") / F.col("gn")
    return j.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("s1").cast("double") / F.col("n"), 6).alias("mean_chars"),
        F.round(loo_mean, 6).alias("loo_mean_chars"),
        F.round(F.sqrt(ls2 / ln - loo_mean * loo_mean), 6).alias(
            "loo_std_chars"
        ),
        F.round(loo_mean - gmean, 6).alias("influence"),
    ).orderBy("source")


# ---------------------------------------------- epoch scheduling

# Per-source epoch counts, the way training recipes quote them
# ("3.5 epochs of wiki, 1 of books, 0.3 of crawl" — cf. the LLaMA and
# GPT-3 mixture tables). Expressed as EXACT rationals (tenths) so the
# fractional part is integer arithmetic against the hash bucket.
EPOCHS_TENTHS: dict[str, int] = {
    f"src{i}": (35, 10, 3)[i % 3] for i in range(20)
}
EPOCH_SALT = "epoch"


def epoch_schedule(
    df: DataFrame,
    group_col: str,
    epochs_tenths: dict[str, int],
    id_col: str,
    *,
    salt: str = EPOCH_SALT,
) -> DataFrame:
    """(id, group, n_copies): how many times each example appears in
    the training stream under a per-source epoch recipe. Whole epochs
    replicate every doc; the fractional epoch keeps a deterministic
    hash slice (the SAME slice every run, so epoch 3.5 trains the
    identical half-corpus a resumed job expects). n_copies =
    floor(e) + (hash_bucket < frac(e)*N_BUCKETS) — the UPSAMPLING
    complement to mixture_resample's downsampling, with PPS-style
    multiplicities instead of row duplication: the trainer's loader
    expands n_copies, the engine never materializes the blow-up.

    Scale shape: broadcast |sources|-row recipe join + map-only hash
    compare; no shuffle at all. Docs from sources absent in the
    recipe are dropped (inner join), n_copies = 0 rows are kept (the
    honest 'this doc sits out this mix' record for audits)."""
    spark = df.sparkSession
    edf = spark.createDataFrame(
        list(epochs_tenths.items()), f"{group_col} string, et int"
    )
    b = hash_bucket(F.col(id_col), salt=salt)
    return df.join(F.broadcast(edf), group_col).select(
        id_col,
        group_col,
        (
            F.expr(f"et div 10")
            + (b < (F.col("et") % 10) * (N_BUCKETS // 10)).cast("int")
        )
        .cast("bigint")
        .alias("n_copies"),
    )


def q_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return epoch_schedule(docs, "source", EPOCHS_TENTHS, "doc_id").orderBy(
        "doc_id"
    )


def _epochs_values_sql() -> str:
    return ", ".join(f"('{k}', {v})" for k, v in EPOCHS_TENTHS.items())


# ------------------------------------------- token-budget filling

# Fill a training-token budget with WHOLE documents, sources in
# priority order: the "data budget allocation" step of a training run
# ("take all of the high-quality sources, then fill the rest from the
# web crawl until the 10B-token budget is hit"). Budget is a RATIONAL
# fraction of the corpus total so the cut point is exact integer
# arithmetic at any SF.
FILL_NUM, FILL_DEN = 1, 2  # budget = half the corpus chars
FILL_SALT = "fill"


def token_budget_fill(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    id_col: str,
    size_col: str,
    *,
    num: int = FILL_NUM,
    den: int = FILL_DEN,
    salt: str = FILL_SALT,
) -> DataFrame:
    """Select the prefix of the (priority, hash) document order whose
    cumulative ``size_col`` fits the budget: all of the top-priority
    sources survive whole, the boundary source is cut at a
    deterministic hash point, everything after is dropped.

    Global order = (weight DESC, group ASC, hash-bucket ASC, id ASC);
    a doc is kept iff its INCLUSIVE cumulative size <= budget =
    total * num DIV den. The cumulative sum is the repo's two-level
    distributed prefix sum — per-(group, bucket) size totals, one
    exclusive-offset window over that |groups|x|buckets| frame
    (constant-size at any data scale), broadcast back, within-bucket
    running sums keyed on (group, bucket) — so no global-order window
    ever sees the corpus. Exact integers end-to-end; the oracle states
    the naive single window over the same total order."""
    from pyspark.sql import Window

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        list(weights.items()), f"{group_col} string, wt double"
    )
    rows = (
        df.join(F.broadcast(wdf), group_col)
        .withColumn("_b", hash_bucket(F.col(id_col), salt=salt))
        .withColumn("_sz", F.col(size_col).cast("bigint"))
    )
    totals = rows.groupBy("wt", group_col, "_b").agg(
        F.sum("_sz").alias("_bw")
    )
    gw = Window.orderBy(
        F.desc("wt"), F.asc(group_col), F.asc("_b")
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bw").over(gw), F.lit(0))
    ).select(group_col, "_b", "_off")
    grand = totals.agg(F.sum("_bw").alias("_tot"))
    iw = (
        Window.partitionBy(group_col, "_b")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.join(F.broadcast(offsets), [group_col, "_b"])
        .withColumn("cum_chars", F.col("_off") + F.sum("_sz").over(iw))
        .crossJoin(F.broadcast(grand))
        .filter(F.col("cum_chars") <= F.expr(f"_tot * {num} div {den}"))
        .select(id_col, group_col, F.col("_sz").alias(size_col), "cum_chars")
    )


def q_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return token_budget_fill(
        docs, "source", SOURCE_WEIGHTS, "doc_id", "n_chars"
    ).orderBy("doc_id")


# ------------------------------------------------- DSIR selection

DSIR_B = 512  # hashed-bigram feature buckets (broadcastable table)
DSIR_TARGET_SOURCES = ("src1", "src7", "src14")  # the "domain" exemplar
DSIR_SELECT_Q = 0.8  # keep the top 20% by Gumbel-perturbed weight
DSIR_SALT = "dsir"
DSIR_GUMBEL_SALT = "dsirg"
_DSIR_HASH_BITS = 52  # 13 hex digits, same as the privacy Gumbel


def dsir_bucketed_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, source, b): one row per BIGRAM OCCURRENCE, hashed into
    ``DSIR_B`` feature buckets — the hashed n-gram features of Data
    Selection via Importance Resampling (Xie et al., NeurIPS 2023).
    Raw token stream (stopwords kept): importance estimation wants the
    full style signal, not the retrieval-pruned one."""
    from searchengine_spark.text.tokenizer import raw_tokens_column

    toked = docs.select(
        "doc_id", "source", raw_tokens_column("text").alias("_toks")
    ).filter(F.size("_toks") >= 2)
    grams = toked.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_toks) - 1),"
                " i -> concat(_toks[i-1], ' ', _toks[i]))"
            )
        ).alias("g"),
    )
    return grams.select(
        "doc_id",
        "source",
        hash_bucket(F.col("g"), n_buckets=DSIR_B, salt=DSIR_SALT).alias("b"),
    )


def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: per-doc importance weight = sum over its
    hashed bigrams of ln(p_target(b)/p_raw(b)) (add-1 smoothed bag-of-
    features models, target = the ``DSIR_TARGET_SOURCES`` domain), then
    Gumbel-perturbed top-quantile selection — the paper's importance
    RESAMPLING, derandomized with the repo's seeded-md5 Gumbel so the
    exact selected SET is oracle-checked.

    Exact-decimal discipline: the per-bucket log-ratio is integerized
    (round(lr*1e6) as bigint) BEFORE the per-doc sum, so document
    scores are order-independent integer sums — no float-associativity
    drift between engines; ln() appears only on identical scalar
    inputs. Selection threshold = exact 0.8 percentile of the integer
    keys (at 100 TB: approx_percentile, same topology — cf. the MAD
    gate note in SCALE.md).

    Scale shape: corpus work is one tokenize scan + one groupBy on the
    uniform 512-bucket key + one per-doc aggregate; the bucket model
    table (512 rows) and the two scalar totals broadcast. Nothing
    corpus-sized is ever sorted or collected.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Persisted: the hashed-bigram stream (an md5 per bigram
    # occurrence) feeds the bucket model AND the per-doc scoring —
    # left lazy the tokenize+md5 scan re-executes per consumer
    # (guide §5 caching note; §1.2 step 1).
    gb = dsir_bucketed_grams(docs).persist()
    is_t = F.col("source").isin(*DSIR_TARGET_SOURCES).cast("long")
    per_b = gb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"), F.sum(is_t).alias("ct")
    )
    # The corpus totals are exactly the column sums of the 512-row
    # bucket table — same integers, one full corpus aggregation saved.
    tot = per_b.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    bf = float(DSIR_B)
    lr = F.log((F.col("ct") + 1.0) / (F.col("nt") + bf)) - F.log(
        (F.col("cr") + 1.0) / (F.col("nr") + bf)
    )
    lrt = (
        per_b.crossJoin(F.broadcast(tot))
        .select("b", F.round(lr * 1e6).cast("bigint").alias("li"))
    )
    scored = (
        gb.join(F.broadcast(lrt), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("li").alias("li_sum"),
        )
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(DSIR_GUMBEL_SALT), F.col("doc_id").cast("string")
                ).cast("binary")
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**_DSIR_HASH_BITS))
    gi = F.round(-F.log(-F.log(u)) * 1e6).cast("bigint")
    # Persisted: keyed (|docs| rows) feeds both the percentile
    # threshold and the final projection — without it the bucket-join
    # + per-doc aggregate subtree runs twice.
    keyed = scored.withColumn("key_i", F.col("li_sum") + gi).persist()
    th = keyed.agg(
        F.percentile(F.col("key_i").cast("double"), F.lit(DSIR_SELECT_Q)).alias(
            "_t"
        )
    )
    return (
        keyed.crossJoin(F.broadcast(th))
        .select(
            "doc_id",
            "source",
            "n_grams",
            F.round(F.col("li_sum") / 1e6, 6).alias("log_w"),
            F.round(F.col("key_i") / 1e6, 6).alias("sel_key"),
            # round-6 discipline at the float boundary: Spark's
            # percentile and DuckDB's quantile_cont interpolate the
            # threshold with different expression orders, so compare
            # ROUNDED key vs ROUNDED threshold (a 1-ulp interpolation
            # difference must not flip `selected` on a boundary doc)
            (
                F.round(F.col("key_i") / 1e6, 6)
                >= F.round(F.col("_t") / 1e6, 6)
            ).alias("selected"),
        )
        .orderBy("doc_id")
    )


_DSIR_TARGET_SQL = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)


def _dsir_sql() -> str:
    from searchengine_spark.text.tokenizer import sql_raw_tokens_expr

    return f"""
        WITH toked AS (
          SELECT doc_id, source, {sql_raw_tokens_expr('text')} AS toks
          FROM documents
        ),
        filt AS (SELECT * FROM toked WHERE len(toks) >= 2),
        gb AS (
          SELECT doc_id, source,
                 (('0x' || substr(md5('{DSIR_SALT}' || g), 1, 15))::BIGINT
                   % {DSIR_B}) AS b
          FROM (
            SELECT doc_id, source,
                   unnest(list_transform(
                     generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1]
                   )) AS g
            FROM filt
          )
        ),
        per_b AS (
          SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
                 CAST(SUM(CASE WHEN source IN ({_DSIR_TARGET_SQL})
                          THEN 1 ELSE 0 END) AS BIGINT) AS ct
          FROM gb GROUP BY b
        ),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nr,
                 CAST(SUM(CASE WHEN source IN ({_DSIR_TARGET_SQL})
                          THEN 1 ELSE 0 END) AS BIGINT) AS nt
          FROM gb
        ),
        lrt AS (
          SELECT b,
                 CAST(round((ln((ct + 1.0) / (nt + {DSIR_B}.0))
                           - ln((cr + 1.0) / (nr + {DSIR_B}.0))) * 1000000.0)
                      AS BIGINT) AS li
          FROM per_b, tot
        ),
        scored AS (
          SELECT g.doc_id, g.source,
                 CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(li) AS BIGINT) AS li_sum
          FROM gb g JOIN lrt USING (b)
          GROUP BY g.doc_id, g.source
        ),
        keyed AS (
          SELECT *,
                 li_sum + CAST(round(-ln(-ln(
                   (('0x' || substr(md5('{DSIR_GUMBEL_SALT}'
                       || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                   / {float(2**_DSIR_HASH_BITS)!r}
                 )) * 1000000.0) AS BIGINT) AS key_i
          FROM scored
        ),
        th AS (
          SELECT quantile_cont(CAST(key_i AS DOUBLE), {DSIR_SELECT_Q})
                   AS t FROM keyed
        )
        SELECT doc_id, source, n_grams,
               round(li_sum / 1000000.0, 6) AS log_w,
               round(key_i / 1000000.0, 6) AS sel_key,
               -- rounded comparison on both sides (round-6 float
               -- discipline): quantile_cont vs Spark percentile may
               -- differ by 1 ulp at the interpolation boundary
               round(key_i / 1000000.0, 6) >= round(t / 1000000.0, 6)
                 AS selected
        FROM keyed, th
        ORDER BY doc_id
    """


QUERIES = {
    "mix_resample_by_source": q_mixture_resample,
    "mix_temperature_resample": q_temperature_resample,
    "mix_curriculum_interleave": q_curriculum_interleave,
    "mix_dsir_selection": q_dsir_selection,
    "mix_token_budget_fill": q_token_budget_fill,
    "mix_epoch_schedule": q_epoch_schedule,
    "mix_loo_source_ablation": q_loo_source_ablation,
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
    "mix_dsir_selection": _dsir_sql(),
    "mix_token_budget_fill": f"""
        WITH w(source, wt) AS (VALUES {_weights_values_sql()}),
        rows0 AS (
          SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
                 w.wt, {_bucket_sql("d.doc_id", FILL_SALT)} AS b
          FROM documents d JOIN w USING (source)
        ),
        cum AS (
          SELECT doc_id, source, n_chars,
                 CAST(SUM(n_chars) OVER (
                   ORDER BY wt DESC, source ASC, b ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum_chars,
                 CAST(SUM(n_chars) OVER () AS BIGINT) AS tot
          FROM rows0
        )
        SELECT doc_id, source, n_chars, cum_chars
        FROM cum WHERE cum_chars <= tot * {FILL_NUM} // {FILL_DEN}
        ORDER BY doc_id
    """,
    "mix_epoch_schedule": f"""
        WITH e(source, et) AS (VALUES {_epochs_values_sql()})
        SELECT d.doc_id, d.source,
               CAST(et // 10
                    + CASE WHEN {_bucket_sql("d.doc_id", EPOCH_SALT)}
                           < (et % 10) * {N_BUCKETS // 10}
                      THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        FROM documents d JOIN e USING (source)
        ORDER BY d.doc_id
    """,
    "mix_loo_source_ablation": """
        WITH per_src AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS s1,
                 CAST(SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
                      AS BIGINT) AS s2
          FROM documents GROUP BY source
        ),
        gtot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS gn,
                 CAST(SUM(s1) AS BIGINT) AS gs1,
                 CAST(SUM(s2) AS BIGINT) AS gs2
          FROM per_src
        )
        SELECT source, n AS n_docs,
               round(CAST(s1 AS DOUBLE) / n, 6) AS mean_chars,
               round(CAST(gs1 - s1 AS DOUBLE) / (gn - n), 6)
                 AS loo_mean_chars,
               round(sqrt(CAST(gs2 - s2 AS DOUBLE) / (gn - n)
                          - (CAST(gs1 - s1 AS DOUBLE) / (gn - n))
                            * (CAST(gs1 - s1 AS DOUBLE) / (gn - n))), 6)
                 AS loo_std_chars,
               round(CAST(gs1 - s1 AS DOUBLE) / (gn - n)
                     - CAST(gs1 AS DOUBLE) / gn, 6) AS influence
        FROM per_src, gtot
        ORDER BY source
    """,
}
