"""Posting-list delta-gap + varint compression accounting.

Real inverted indexes never store raw 8-byte doc ids: postings are
sorted, so consecutive ids are delta-encoded and the (small) gaps
stored as LEB128 varints — the layout behind every production index
(Lucene, and the compressed-postings literature). The reference keeps
its postings as plain Python lists (searchenginespark.py's inverted
dict); at 100 TB the postings ARE the index storage bill, so this
operator computes, per term, the exact byte cost of the
delta-gap+varint layout vs raw fixed-width, entirely inside
whole-stage codegen.

Shape: the sorted postings arrays already exist (inverted_index is
collect_list(sorted)); gap computation is a per-row array transform
(element i minus element i-1) and the varint size an integer CASE
ladder folded with F.aggregate — map-only over the cached index, no
new shuffle. The ladder uses pure integer comparisons (no log2) so
both engines agree bit-for-bit.

The first posting is stored as its absolute id (gap vs 0), matching
the standard layout where a block header carries no base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.index.queries import _INDEX_CTES, _index

# LEB128: 7 payload bits per byte.
_VARINT_STEPS = (1 << 7, 1 << 14, 1 << 21, 1 << 28)


def varint_bytes(col):
    """Bytes needed to LEB128-encode a non-negative bigint < 2^35."""
    expr = F.lit(len(_VARINT_STEPS) + 1)
    for n_bytes, bound in reversed(list(enumerate(_VARINT_STEPS, start=1))):
        expr = F.when(col < bound, F.lit(n_bytes)).otherwise(expr)
    return expr.cast("bigint")


def q_postings_varint_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    inv = _index(spark, sf_dir).inverted_index
    gaps = F.transform(
        "doc_ids",
        lambda x, i: x
        - F.when(i > 0, F.element_at(F.col("doc_ids"), i)).otherwise(F.lit(0)),
    )
    byte_costs = F.transform(gaps, varint_bytes)
    total = F.aggregate(
        byte_costs, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return inv.select(
        "word",
        F.size("doc_ids").cast("bigint").alias("n_docs"),
        (F.size("doc_ids").cast("bigint") * 8).alias("raw_bytes"),
        total.alias("varint_bytes"),
        F.round(
            (F.size("doc_ids").cast("bigint") * 8).cast("double") / total, 6
        ).alias("compression_ratio"),
    )


# Oracle: same gaps from the tf relation with a lag window (the array
# in the Spark plan and the window here see identical sorted postings
# because tf is unique on (word, doc_id)).
_VARINT_CASE = (
    "CASE "
    + " ".join(
        f"WHEN gap < {bound} THEN {n}"
        for n, bound in enumerate(_VARINT_STEPS, start=1)
    )
    + f" ELSE {len(_VARINT_STEPS) + 1} END"
)

_COMPRESSION_SQL = f"""{_INDEX_CTES},
gaps AS (
  SELECT word,
         doc_id - COALESCE(lag(doc_id) OVER (PARTITION BY word ORDER BY doc_id),
                           0) AS gap
  FROM tf
),
costs AS (
  SELECT word, {_VARINT_CASE} AS nb FROM gaps
)
SELECT word,
       count(*)::BIGINT AS n_docs,
       (count(*) * 8)::BIGINT AS raw_bytes,
       CAST(sum(nb) AS BIGINT) AS varint_bytes,
       round((count(*) * 8)::DOUBLE / CAST(sum(nb) AS BIGINT), 6)
         AS compression_ratio
FROM costs
GROUP BY word
"""

QUERIES = {"se_postings_varint_compression": q_postings_varint_compression}
ORACLES = {"se_postings_varint_compression": _COMPRESSION_SQL}
