"""TF-IDF document similarity — all-pairs and probe-vs-corpus.

The reference ranks documents against a QUERY (BM25,
/root/reference/searchenginespark.py:64-75); a curation pipeline also
needs document-vs-document similarity: "which documents are
near-copies or topical twins of which". Two shapes:

- ``sim_tfidf_shingle_pairs`` — ALL-PAIRS similarity over 3-token
  shingle TF-IDF vectors, the Bayardo et al. (WWW'07) inverted-index
  approach: pairs are generated ONLY through shared features via an
  equi-join on the shingle, never a cross join, and a df-cap drops
  boilerplate features whose posting lists would dominate the join
  (same cap discipline as operators/decontamination.py and the
  cross-doc span detector). Cost is sum over features of df² — with
  rare features (shingle median df = 1 on the testdata) that is
  near-linear, and the df-cap bounds the worst feature at CAP².
- ``sim_tfidf_doc_topk`` — one probe document ranked against the
  corpus on unigram TF-IDF cosine: the probe's (tiny) weight vector
  broadcast-joins the term postings; one groupBy(doc) sums the dot
  products. Linear in corpus size, the serving-shape twin of
  index/bm25.py's query scoring.

Determinism contract (same fixed-point trick as operators/kmeans.py
and quantization.py): weights are quantized to integers,
w = floor(tf * log10(n_docs/df) * 10^4 + 0.5), so dot products and
squared norms are EXACT BIGINT sums — order-independent, identical
in DuckDB. log10(n/df) itself is IEEE-identical across engines (the
driver-green se_idf_values row proves it on these inputs). The final
cosine divides two exact integers' double images and rounds to 6.

For the PAIR query, both dot products AND norms run over the
df-capped feature set only (the "effective vector" after boilerplate
removal) — one consistent vector space, stated here because cosine
against full-vector norms would differ once a feature crosses the
cap. The probe query keeps every feature: its join is bounded by the
probe vector, not by posting lists, so there is nothing to cap (and
on a small corpus a unigram cap would empty the space entirely).

Magnitude audit (why bigint never overflows): |w| <= tf_max *
log10(n) * 10^4 ~ 2e6 even at tf=50, n=10^9; per-pair dot sums
<= shared_features * w² ~ 1e16 << 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table
from searchengine_spark.operators.dedup import SHINGLE_K, _shingles
from searchengine_spark.text.tokenizer import sql_tokens_expr, tokens_column

FP = 10_000          # fixed-point weight resolution 1e-4
DF_CAP = 20          # drop features present in more docs (boilerplate)
PAIR_MIN_COS = 0.5   # testdata pair cosines are bimodal (<0.32 noise,
#                      >0.97 near-dup); 0.5 sits in the empty gap.
PROBE_DOC_ID = 0
TOP_K = 10


def _weights(
    tf: DataFrame, n_docs: DataFrame, *, df_cap: int | None = DF_CAP
) -> DataFrame:
    """(doc_id, feature, w bigint) — fixed-point TF-IDF, optionally
    df-capped.

    ``tf`` has one row per (doc_id, feature) with its count; df is
    recovered as a row count per feature (no countDistinct needed).
    The cap exists for PAIR GENERATION (posting-list join blowup);
    probe scoring keeps every feature — the probe vector bounds the
    join all by itself, and idf already downweights common terms.
    """
    dft = tf.groupBy("feature").agg(F.count(F.lit(1)).alias("df"))
    if df_cap is not None:
        dft = dft.filter(F.col("df") <= df_cap)
    return (
        tf.join(dft, "feature")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "feature",
            F.floor(
                F.col("tf") * F.log10(F.col("n") / F.col("df")) * FP
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("w"),
        )
    )


def _norms(w: DataFrame) -> DataFrame:
    """(doc_id, n2 bigint) — exact squared L2 norm.

    Zero-norm vectors are dropped: a doc whose every surviving
    feature has idf 0 (feature in ALL docs) has no direction, so
    cosine against it is undefined — and ANSI mode would turn the
    0/0 into a job-killing DIVIDE_BY_ZERO. Dropping the doc here
    removes it from pair generation and ranking symmetrically.
    """
    return (
        w.groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
        .filter(F.col("n2") > 0)
    )


def tfidf_shingle_pairs(
    shingles: DataFrame, n_docs: DataFrame, *, min_cos: float = PAIR_MIN_COS
) -> DataFrame:
    """(doc_a, doc_b, shared_features, cosine) for pairs with
    cosine >= min_cos; candidates only through shared features."""
    # Persisted: the weight frame feeds BOTH candidate-join sides and
    # both norm lookups, and tf additionally feeds the df aggregation
    # inside _weights — left lazy, the explode -> groupBy(doc, feature)
    # subtree re-executes once per consumer (~6 corpus passes for one
    # result; guide §5 caching note, same policy as setjoin's `sets`).
    # Stays persisted: the result's lineage reads it; registry queries
    # hold it only for the session, like the shingle cache upstream.
    tf = (
        shingles.select("doc_id", F.explode("shingles").alias("feature"))
        .groupBy("doc_id", "feature")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    w = _weights(tf, n_docs).persist()
    norms = _norms(w).persist()
    a = w.select(
        F.col("doc_id").alias("doc_a"), "feature", F.col("w").alias("wa")
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), "feature", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "feature")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
            F.count(F.lit(1)).alias("shared_features"),
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    from searchengine_spark.io import cut_and_release

    return cut_and_release(
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_features",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(min_cos)),
        tf,
        w,
        norms,
    )


def tfidf_probe_topk(
    docs: DataFrame,
    *,
    probe_doc_id: int = PROBE_DOC_ID,
    k: int = TOP_K,
) -> DataFrame:
    """Eager wrapper over :func:`tfidf_probe_topk_plan`: cut the
    k-row result's lineage and release the scratch persists (r14
    hygiene sweep — see io.cut_and_release)."""
    from searchengine_spark.io import cut_and_release

    out, scratch = tfidf_probe_topk_plan(
        docs, probe_doc_id=probe_doc_id, k=k
    )
    return cut_and_release(out, *scratch)


def tfidf_probe_topk_plan(
    docs: DataFrame,
    *,
    probe_doc_id: int = PROBE_DOC_ID,
    k: int = TOP_K,
) -> tuple[DataFrame, tuple[DataFrame, ...]]:
    """Rank the corpus against one probe document on unigram TF-IDF
    cosine. The probe's weight vector is a broadcast side; scoring is
    one equi-join on the term plus one groupBy(doc) — linear.
    Returns (lazy result, persisted scratch frames) — the plan-shape
    tests read the lazy side."""
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    # Same persist rationale as tfidf_shingle_pairs: w feeds norms,
    # the probe vector, and the scoring join (3 evals of the tokenize
    # -> groupBy subtree left lazy); norms feeds the probe norm and
    # the ranking join.
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_column("text")).alias("feature")
        )
        .groupBy("doc_id", "feature")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    w = _weights(tf, n_docs, df_cap=None).persist()
    norms = _norms(w).persist()
    probe_w = w.filter(F.col("doc_id") == probe_doc_id).select(
        "feature", F.col("w").alias("wp")
    )
    probe_n = norms.filter(F.col("doc_id") == probe_doc_id).select(
        F.col("n2").alias("np2")
    )
    dots = (
        w.filter(F.col("doc_id") != probe_doc_id)
        .join(F.broadcast(probe_w), "feature")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("wp")).alias("dot"))
    )
    out = (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(probe_n))
        .select(
            "doc_id",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("n2").cast("double"))
                    * F.sqrt(F.col("np2").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(k)
    )
    return out, (tf, w, norms)


# --------------------------------------------------------------- queries

def q_tfidf_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_shingle_pairs(
        _shingles(spark, sf_dir), docs.agg(F.count(F.lit(1)).alias("n"))
    )


def q_tfidf_doc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_probe_topk(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------- oracles

# Shared weight CTEs, parameterized by the feature extraction.
def _weight_ctes(feature_cte: str, df_cap: int | None = DF_CAP) -> str:
    cap_pred = f"WHERE dft.df <= {df_cap}" if df_cap is not None else ""
    return f"""
{feature_cte},
tf AS (
  SELECT doc_id, feature, count(*) AS tf FROM feat GROUP BY doc_id, feature
),
dft AS (SELECT feature, count(*) AS df FROM tf GROUP BY feature),
n AS (SELECT count(*) AS n FROM documents),
w AS (
  SELECT tf.doc_id, tf.feature,
         CAST(floor(tf.tf * log10(n.n / dft.df) * {FP} + 0.5) AS BIGINT) AS w
  FROM tf JOIN dft ON tf.feature = dft.feature, n
  {cap_pred}
),
nrm AS (
  SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2 FROM w
  GROUP BY doc_id HAVING SUM(w * w) > 0
)
"""


_SHINGLE_FEAT_CTE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens_expr('text')} AS t FROM documents
),
feat AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {SHINGLE_K - 2}),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS feature
  FROM toks WHERE len(t) >= {SHINGLE_K}
)"""

_UNIGRAM_FEAT_CTE = f"""
WITH feat AS (
  SELECT doc_id, unnest({sql_tokens_expr('text')}) AS feature FROM documents
)"""


QUERIES = {
    "sim_tfidf_shingle_pairs": q_tfidf_shingle_pairs,
    "sim_tfidf_doc_topk": q_tfidf_doc_topk,
}

ORACLES = {
    "sim_tfidf_shingle_pairs": f"""
        {_weight_ctes(_SHINGLE_FEAT_CTE)}
        , dots AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(SUM(a.w * b.w) AS BIGINT) AS dot,
                 count(*)::BIGINT AS shared_features
          FROM w a JOIN w b ON a.feature = b.feature AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, shared_features,
               round(CAST(dot AS DOUBLE) /
                     (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))),
                     6) AS cosine
        FROM dots JOIN nrm x ON dots.doc_a = x.doc_id
                  JOIN nrm y ON dots.doc_b = y.doc_id
        WHERE round(CAST(dot AS DOUBLE) /
                    (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))),
                    6) >= {PAIR_MIN_COS}
    """,
    "sim_tfidf_doc_topk": f"""
        {_weight_ctes(_UNIGRAM_FEAT_CTE, df_cap=None)}
        , dots AS (
          SELECT d.doc_id, CAST(SUM(d.w * p.w) AS BIGINT) AS dot
          FROM w d JOIN w p
            ON d.feature = p.feature
           AND p.doc_id = {PROBE_DOC_ID} AND d.doc_id <> {PROBE_DOC_ID}
          GROUP BY d.doc_id
        )
        SELECT dots.doc_id,
               round(CAST(dot AS DOUBLE) /
                     (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(p.n2 AS DOUBLE))),
                     6) AS cosine
        FROM dots
        JOIN nrm x ON dots.doc_id = x.doc_id
        JOIN (SELECT n2 FROM nrm WHERE doc_id = {PROBE_DOC_ID}) p ON TRUE
        ORDER BY cosine DESC, dots.doc_id ASC
        LIMIT {TOP_K}
    """,
}
