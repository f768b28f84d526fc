"""Asymmetric containment dedup: docs mostly CONTAINED in another doc.

Jaccard near-dup (operators/dedup.py, setjoin.py) is symmetric, so a
short document quoted verbatim inside a much longer one scores low
(the union is dominated by the long doc) and survives dedup. The
curation-relevant relation is containment

    c(A -> B) = |shingles(A) & shingles(B)| / |shingles(A)|

which flags quotes, boilerplate wrappers, and subset re-posts. This
module emits every ORDERED pair with c(A -> B) >= CONT_NUM/CONT_DEN.

Exact candidate generation (no LSH recall loss): the prefix-filter
argument (setjoin.py) adapted to the asymmetric case — if A and B
share >= ceil(t*|A|) shingles, B must contain at least one of the
first |A| - ceil(t*|A|) + 1 shingles of A's df-ascending ordering.
So the join is A-prefix |x| B-ALL-postings on the shingle, then one
integer-exact verify (d*inter >= n*|A|) — never a cartesian. The
full-postings side is the exactness price; the production knob at
100 TB is the same df-cap decontamination.py uses (boilerplate
shingles dominate postings and can't certify containment of anything
but boilerplate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CONT_NUM = 4
CONT_DEN = 5


def containment_pairs(
    shingles: DataFrame, *, t_num: int = CONT_NUM, t_den: int = CONT_DEN
) -> DataFrame:
    """(doc_a, doc_b, containment) for every ordered pair with
    containment(a in b) >= t_num/t_den. ``shingles``: (doc_id,
    shingles array) as from dedup.shingle_frame."""
    sets = (
        shingles.select("doc_id", F.array_distinct("shingles").alias("s"))
        .withColumn("size", F.size("s"))
        .persist()
    )
    tok = sets.select("doc_id", "size", F.explode("s").alias("tok"))
    df_counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = tok.join(df_counts, "tok").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("tok"))
        ),
    )
    # prefix length = size - ceil(t*size) + 1 (integer ceil)
    a_prefix = ranked.filter(
        F.col("pos")
        <= F.col("size")
        - F.expr(f"({t_num} * size + {t_den - 1}) div {t_den}")
        + F.lit(1)
    ).select(F.col("doc_id").alias("doc_a"), F.col("size").alias("size_a"), "tok")
    b_all = tok.select(
        F.col("doc_id").alias("doc_b"), F.col("size").alias("size_b"), "tok"
    )
    cand = (
        a_prefix.join(b_all, "tok")
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            # |A & B| >= t|A| needs |B| >= t|A|
            & (t_den * F.col("size_b") >= t_num * F.col("size_a"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    from searchengine_spark.io import cut_and_release

    return cut_and_release(
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        # integer-exact threshold: inter/|A| >= n/d <=> d*inter >= n*|A|
        .filter(t_den * inter >= t_num * F.size("sh_a"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                inter.cast("double") / F.size("sh_a").cast("double"), 6
            ).alias("containment"),
        ),
        sets,
    )


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from searchengine_spark.operators.dedup import _shingles

    return containment_pairs(_shingles(spark, sf_dir))


def _oracle(t_num: int = CONT_NUM, t_den: int = CONT_DEN) -> str:
    """Brute-force ordered-pairs twin (quadratic, oracle scale only)."""
    from searchengine_spark.operators.dedup import SHINGLE_K
    from searchengine_spark.text.tokenizer import sql_tokens_expr

    toks = sql_tokens_expr("text")
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - {SHINGLE_K - 2}),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= {SHINGLE_K}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / CAST(len(a.s) AS DOUBLE), 6) AS containment
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    WHERE {t_den} * len(list_intersect(a.s, b.s)) >= {t_num} * len(a.s)
    """


QUERIES = {"dedup_containment_pairs": q_containment_pairs}
ORACLES = {"dedup_containment_pairs": _oracle()}
