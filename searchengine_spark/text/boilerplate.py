"""Line-level boilerplate removal — RefinedWeb/CCNet-style line-wise
dedup across documents.

Web-scale corpora carry the same literal LINES in thousands of
documents (cookie banners, "subscribe" calls, rights notices) that
survive document-level dedup because the surrounding text differs.
The standard fix (Penedo et al., RefinedWeb; CCNet's paragraph hash
dedup) removes lines whose document frequency crosses a share
threshold, then reassembles each document from its surviving lines
IN ORDER. This is distinct from:
  - exact/near document dedup (operators/dedup.py — whole-doc keys),
  - cross-doc verbatim SPANS (token-positional shingles, any
    alignment), and
  - intra-doc repetition scrub (text/intradoc.py — within one doc).

Scale shape: one line explode (bounded by corpus text volume), one
line-keyed distinct-doc count (the single shuffle), the boilerplate
set broadcast back (high-df lines are FEW DISTINCT strings by
definition — the df threshold caps the broadcast at
docs/threshold-share distinct lines), and one doc-keyed reassembly
aggregation. The share threshold (not an absolute count) keeps the
operator scale-invariant: the same fraction flags at sf0.001 and at
100 TB.

Fixture: the synthetic corpus is single-line, so deterministic
boilerplate lines are appended per doc_id residue IN BOTH ENGINES —
a near-universal rights notice, two mid-frequency promos, a rarer
settings line — while every doc's original text stays its own
(low-df) first line. The reassembly md5 in the scrub query pins
line ORDER, not just the surviving set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import ensure_min_partitions, load_table

# A line is boilerplate when it appears in MORE THAN this share of
# documents. 2% mirrors the C4/RefinedWeb-style "common line" cut.
BOILER_DOC_SHARE = 0.02

# (residue predicate id, line) — append order is FIXED; the oracle
# restates the same CASE chain. Single quotes forbidden.
BOILER_LINES: tuple[tuple[str, str], ...] = (
    ("mod8ne7", "all rights reserved example corp"),
    ("mod3", "subscribe to our newsletter today"),
    ("mod5", "click here to read more stories"),
    ("mod11", "privacy policy and cookie settings"),
)


def _cond(pred: str):
    d = F.col("doc_id")
    return {
        "mod8ne7": d % 8 != 7,
        "mod3": d % 3 == 0,
        "mod5": d % 5 == 0,
        "mod11": d % 11 == 0,
    }[pred]


def with_boilerplate_lines(docs: DataFrame) -> DataFrame:
    parts = [F.coalesce(F.col("text"), F.lit(""))]
    for pred, line in BOILER_LINES:
        parts.append(
            F.when(_cond(pred), F.lit("\n" + line)).otherwise(F.lit(""))
        )
    return docs.select("doc_id", F.concat(*parts).alias("text"))


def _lines(docs: DataFrame) -> DataFrame:
    return ensure_min_partitions(docs).select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    )


def boilerplate_lines(
    docs: DataFrame, *, share: float = BOILER_DOC_SHARE
) -> DataFrame:
    """(line, n_docs) for every line whose distinct-document count
    exceeds ``share`` of the corpus."""
    lines = _lines(docs)
    total = docs.agg(F.count(F.lit(1)).alias("_total"))
    return (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_docs") > F.lit(share) * F.col("_total"))
        .select("line", "n_docs")
    )


def scrub_boilerplate(
    docs: DataFrame, *, share: float = BOILER_DOC_SHARE
) -> DataFrame:
    """Per-document scrub audit: line counts before/after plus the
    md5 of the reassembled (order-preserving) text. The boilerplate
    set rides a broadcast anti-join — the corpus-wide line stream
    never shuffles twice."""
    lines = _lines(docs)
    boiler = boilerplate_lines(docs, share=share).select("line")
    kept = lines.join(F.broadcast(boiler), "line", "left_anti")
    scrub = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("_stext"),
    )
    before = docs.select(
        "doc_id", F.size(F.split("text", "\n")).cast("bigint").alias("n_lines")
    )
    return before.join(scrub, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.md5(F.coalesce(F.col("_stext"), F.lit("")).cast("binary")).alias(
            "scrubbed_md5"
        ),
    )


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_lines(
        with_boilerplate_lines(load_table(spark, sf_dir, "documents"))
    )


def q_line_scrubbed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scrub_boilerplate(
        with_boilerplate_lines(load_table(spark, sf_dir, "documents"))
    )


# ---------------------------------------------------------- oracles

_CASES_SQL = {
    "mod8ne7": "doc_id % 8 <> 7",
    "mod3": "doc_id % 3 = 0",
    "mod5": "doc_id % 5 = 0",
    "mod11": "doc_id % 11 = 0",
}

_FIXTURE_TEXT = "coalesce(text, '')" + "".join(
    f" || CASE WHEN {_CASES_SQL[pred]} THEN chr(10) || '{line}' "
    "ELSE '' END"
    for pred, line in BOILER_LINES
)

_BOILER_CTES = f"""
WITH bdocs AS (
  SELECT doc_id, {_FIXTURE_TEXT} AS text FROM documents
),
lines AS (
  SELECT doc_id, u.pos AS pos, u.line AS line FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(parts)+1),
                                 i -> {{'pos': i, 'line': parts[i]}})) AS u
    FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM bdocs)
  )
),
total AS (SELECT count(*) AS n FROM bdocs),
boiler AS (
  SELECT line, count(DISTINCT doc_id)::BIGINT AS n_docs
  FROM lines GROUP BY line
  HAVING count(DISTINCT doc_id) > {BOILER_DOC_SHARE} * (SELECT n FROM total)
)"""

QUERIES = {
    "dedup_boilerplate_lines": q_boilerplate_lines,
    "pipeline_line_scrubbed_docs": q_line_scrubbed_docs,
}

ORACLES = {
    "dedup_boilerplate_lines": f"""{_BOILER_CTES}
        SELECT line, n_docs FROM boiler
    """,
    "pipeline_line_scrubbed_docs": f"""{_BOILER_CTES},
kept AS (
  SELECT l.doc_id, l.pos, l.line FROM lines l
  WHERE l.line NOT IN (SELECT line FROM boiler)
),
scrub AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS stext
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       len(string_split(b.text, chr(10)))::BIGINT AS n_lines,
       coalesce(s.n_kept, 0)::BIGINT AS n_kept,
       md5(coalesce(s.stext, '')) AS scrubbed_md5
FROM bdocs b LEFT JOIN scrub s ON s.doc_id = b.doc_id
""",
}
