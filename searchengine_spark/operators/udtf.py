"""Python UDTF surface (Spark 4): a sentence-splitting table function.

The reference has no UDTFs (SURVEY §2.9); this demonstrates the
remaining lateral-generator API family with a text operator the
curation pipeline actually uses: one input document row expands to
N (sentence_id, sentence, n_chars) rows, usable via the DataFrame
API or `LATERAL` in SQL after spark.udtf.register.

Note: row-based UDTFs cross the JVM/Python boundary per row — for
bulk splitting prefer the native array path (F.split + posexplode,
see split_sentences_native below, which is what production jobs
should call). The UDTF exists for API completeness and for cases
needing imperative per-row logic.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sentence_id: int, sentence: string, n_chars: int")
class SplitSentences:
    """Expand a document into sentence rows."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if not text:
            return
        for i, s in enumerate(p for p in _SENT_SPLIT.split(text) if p.strip()):
            yield i, s.strip(), len(s.strip())


def split_sentences_native(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """The whole-stage-codegen twin: split + posexplode, no Python."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"(?<=[.!?])\s+"),
                lambda s: F.trim(s) != F.lit(""),
            )
        ).alias("sentence_id", "sentence"),
    ).withColumn("sentence", F.trim("sentence")).withColumn(
        "n_chars", F.length("sentence").cast("int")
    )
