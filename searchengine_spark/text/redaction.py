"""PII-style redaction and text normalization — the scrub pass a
training-data pipeline runs before anything is tokenized or shipped:
emails, URLs, and long digit runs (phone/account-number shaped) are
replaced with stable placeholder tokens, and whitespace is
normalized.

Pure map stage (chained regexp_replace, whole-stage codegen, no UDF)
— at 100 TB this runs at scan bandwidth like the quality gate.

Regex dialect: patterns use only character classes, alternation and
bounded repetition — the common subset Java (Spark) and RE2-ish
(DuckDB) engines treat identically; no backreferences or lookaround.
Both engines replace ALL occurrences (Spark regexp_replace is global
by default; the DuckDB twin passes the 'g' flag).

The oracle query fingerprints the scrubbed text (md5) so the driver
check proves both engines produced byte-identical outputs for every
document — a much stronger statement than spot-checking planted PII.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

# (pattern, replacement) applied in order. Order matters: URLs can
# contain digit runs and @-signs, so URLs go first.
REDACTION_RULES: tuple[tuple[str, str], ...] = (
    (r"https?://[^ \t\n]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"[0-9][0-9][0-9][0-9][0-9][0-9]+", "<NUM>"),  # >= 6 digits
)
_WS = r"[ \t\n]+"


def scrub_expr(text: Column) -> Column:
    out = text
    for pat, rep in REDACTION_RULES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, _WS, " "))


def scrub_documents(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Replace `text` with its scrubbed form (other columns pass
    through unchanged)."""
    return docs.withColumn(text_col, scrub_expr(F.col(text_col)))


def sql_scrub_expr(text_expr: str = "text") -> str:
    out = text_expr
    for pat, rep in REDACTION_RULES:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"trim(regexp_replace({out}, '{_WS}', ' ', 'g'))"


def q_scrubbed_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 of every scrubbed document — proves the two engines scrub
    byte-identically across the whole corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return scrub_documents(docs).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("scrubbed_md5")
    )


QUERIES = {"text_scrubbed_fingerprint": q_scrubbed_fingerprint}

ORACLES = {
    "text_scrubbed_fingerprint": f"""
        SELECT doc_id, md5({sql_scrub_expr("text")}) AS scrubbed_md5
        FROM documents
    """,
}
