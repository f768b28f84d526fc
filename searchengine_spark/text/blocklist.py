"""Blocklist / banned-phrase content filtering.

A training-data pipeline screens documents against curated ban lists
(unsafe phrases, spam markers, boilerplate signatures) *before* the
expensive dedup and tokenization stages. The reference engine has no
such stage (it only ranks; abh2050/searchengine app.py searches, never
filters), so this is a pipeline-extension operator: per-document
phrase hits with per-phrase severities and a policy verdict.

Semantics: a phrase hits when it appears word-boundary-exact in the
lowercased text (single words and multi-word phrases both supported
via the padded-spaces trick — no regex, no tokenizer dependency).
Each phrase counts at most once per document (presence, not
occurrence count — occurrence counting rewards long docs and is what
spam *wants*). A document is dropped when any severity-3 phrase hits
or the total severity across distinct hits reaches ``DROP_TOTAL``.

Scale shape: ONE map stage — the blocklist is compile-time bounded
(curated lists are thousands of entries, not data-sized), so the
presence tests fold into whole-stage codegen over a single scan; no
shuffle, no UDF, no explode. For ban lists too large to inline
(millions of entries) the scale path flips to the join form: extract
the document's n-grams and equi-join against the broadcast ban table
— same pattern as `operators/decontamination.py`, which already
proves that shape. The full-corpus audit frame (every doc_id with its
verdict) is what a provenance-tracked pipeline persists; the kept
set is a trivial filter on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

# (phrase, severity). Severity 3 = instant drop; lower severities
# accumulate. "stale cache" never occurs in the synthetic corpus —
# deliberately, so the never-matching entry is exercised too.
BLOCKLIST: list[tuple[str, int]] = [
    ("slow merge", 3),
    ("big vector", 2),
    ("hash join", 1),
    ("window spark", 1),
    ("stale cache", 2),
]
DROP_TOTAL = 4


def _hit(text_padded: Column, phrase: str) -> Column:
    """1 when ``phrase`` appears word-boundary-exact, else 0."""
    return text_padded.contains(f" {phrase} ").cast("long")


def blocklist_audit(docs: DataFrame) -> DataFrame:
    """(doc_id, n_hits, sev_total, dropped) for every document."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    hits = [_hit(padded, p).alias(f"_h{i}") for i, (p, _) in enumerate(BLOCKLIST)]
    with_hits = docs.select("doc_id", *hits)
    n_hits = sum(F.col(f"_h{i}") for i in range(len(BLOCKLIST)))
    sev_total = sum(
        F.col(f"_h{i}") * F.lit(s) for i, (_, s) in enumerate(BLOCKLIST)
    )
    hard_hit = sum(
        F.col(f"_h{i}") for i, (_, s) in enumerate(BLOCKLIST) if s >= 3
    )
    return with_hits.select(
        "doc_id",
        n_hits.cast("bigint").alias("n_hits"),
        sev_total.cast("bigint").alias("sev_total"),
        ((hard_hit > 0) | (sev_total >= DROP_TOTAL)).alias("dropped"),
    )


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus blocklist audit, ordered by doc_id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return blocklist_audit(docs).orderBy("doc_id")


def _blocklist_sql() -> str:
    hit_exprs = []
    sev_exprs = []
    hard_exprs = []
    for p, s in BLOCKLIST:
        h = (
            "CASE WHEN position(' {p} ' IN ' ' || lower(text) || ' ') > 0 "
            "THEN 1 ELSE 0 END"
        ).format(p=p)
        hit_exprs.append(h)
        sev_exprs.append(f"({h}) * {s}")
        if s >= 3:
            hard_exprs.append(h)
    return f"""
        WITH h AS (
          SELECT doc_id,
                 {' + '.join(hit_exprs)} AS nh,
                 {' + '.join(sev_exprs)} AS sv,
                 {' + '.join(hard_exprs)} AS hard
          FROM documents
        )
        SELECT doc_id,
               CAST(nh AS BIGINT) AS n_hits,
               CAST(sv AS BIGINT) AS sev_total,
               (hard > 0 OR sv >= {DROP_TOTAL}) AS dropped
        FROM h
        ORDER BY doc_id
    """


def blocklist_audit_join(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """The JOIN form of the same policy — the scale path for ban
    lists too large to inline (millions of entries): the ban list is
    a TABLE, the document side emits its word n-grams map-side, and
    candidates come from an equi-join on the n-gram (broadcast while
    the list is small; a shuffled hash join on the uniform n-gram key
    when it is not — either way cost is |grams| + |list|, never
    |docs| * |list| the way N contains() probes per row would be).
    Hits dedup per (doc, phrase) so presence semantics match the
    inline form exactly; docs with no hits come back via the left
    join with zeroes. All BLOCKLIST entries are 2-word phrases, so
    bigrams are the only gram width needed here; mixed-width lists
    emit one gram frame per distinct width."""
    ban = spark.createDataFrame(
        [(p, s) for p, s in BLOCKLIST], "phrase string, sev int"
    )
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("w")
    )
    grams = toks.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(w[i], ' ', w[i + 1]))"
            )
        ).alias("phrase"),
    )
    hits = (
        grams.join(F.broadcast(ban), "phrase")
        .select("doc_id", "phrase", "sev")
        .distinct()
    )
    per_doc = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_nh"),
        F.sum("sev").alias("_sv"),
        F.max((F.col("sev") >= 3).cast("int")).alias("_hard"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_nh"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.coalesce(F.col("_sv"), F.lit(0)).cast("bigint").alias("sev_total"),
            (
                (F.coalesce(F.col("_hard"), F.lit(0)) > 0)
                | (F.coalesce(F.col("_sv"), F.lit(0)) >= DROP_TOTAL)
            ).alias("dropped"),
        )
    )


def q_blocklist_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-form blocklist audit — must produce byte-identical rows
    to the inline form (same oracle), proving the scale path."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return blocklist_audit_join(docs, spark).orderBy("doc_id")


QUERIES = {
    "text_blocklist_filter": q_blocklist_filter,
    "text_blocklist_join_filter": q_blocklist_join_filter,
}
ORACLES = {
    "text_blocklist_filter": _blocklist_sql(),
    # identical semantics by design: the join form is checked against
    # the SAME twin, so inline and join paths can never drift apart
    "text_blocklist_join_filter": _blocklist_sql(),
}
