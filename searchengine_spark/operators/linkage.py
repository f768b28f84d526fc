"""Record linkage: multi-pass blocking + edit-distance verification.

Entity resolution over dirty text keys — the classic two-stage shape
(blocking to bound candidates, then exact Levenshtein verify) that a
cross-source corpus merge needs. The dirty side is derived
deterministically from the documents themselves (one character deleted
from a normalized 24-char name at a doc_id-dependent position), so
both engines build identical inputs and the linkage contract is
oracle-checkable end to end.

Blocking is pigeonhole-EXACT for the single-deletion error model:
a deletion at position p leaves the first BLOCK chars intact when
p > BLOCK, and the last BLOCK chars intact when p <= len - BLOCK;
names are filtered to len >= 2*BLOCK, so every true pair survives at
least one of the two passes (prefix block, suffix block) — the same
banding argument as the dHash near-dup join (operators/phash.py).

Scale shape: two equi-joins on block keys (never a cartesian), block
population bounded by names sharing a 6-char affix; candidates then
pass one integer levenshtein. At sf0.1 the candidate volume is ~470k
pairs (measured sum of squared block sizes); at 100 TB you widen
BLOCK or add a third mid-name pass — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.io import load_table

NAME_LEN = 24
BLOCK = 6
MAX_DIST = 1
# deletion position cycles over the name (1-based, within 1..20)
_DEL_MOD = 20


def clean_entities(docs: DataFrame) -> DataFrame:
    """Normalized entity names: letters+spaces, first NAME_LEN chars,
    only names long enough for exact two-pass blocking coverage."""
    name = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""), 1, NAME_LEN
    )
    return docs.select(F.col("doc_id"), name.alias("name")).filter(
        F.length("name") >= 2 * BLOCK
    )


def dirty_entities(docs: DataFrame) -> DataFrame:
    """The perturbed register: one char deleted at a doc_id-dependent
    position."""
    ents = clean_entities(docs)
    pos = (F.col("doc_id") % _DEL_MOD + 1).cast("int")
    dirty = F.concat(
        F.col("name").substr(F.lit(1), pos - 1),
        F.col("name").substr(pos + 1, F.lit(NAME_LEN)),
    )
    return ents.select(
        F.col("doc_id").alias("dirty_id"), dirty.alias("dirty_name")
    )


def link_blocked(clean: DataFrame, dirty: DataFrame) -> DataFrame:
    """Union of prefix-BLOCK and suffix-BLOCK blocking passes, then
    Levenshtein <= MAX_DIST verification; pairs deduped across passes."""
    # Persisted: each side feeds BOTH blocking passes — left lazy the
    # full-text regexp-normalize scan executes twice per side (4x per
    # result; guide §5 caching note). Narrow frames: id + 24-char name
    # + two 6-char keys.
    c = clean.select(
        "doc_id",
        "name",
        F.substring("name", 1, BLOCK).alias("bp"),
        F.col("name").substr(
            F.length("name") - BLOCK + 1, F.lit(BLOCK)
        ).alias("bs"),
    ).persist()
    d = dirty.select(
        "dirty_id",
        "dirty_name",
        F.substring("dirty_name", 1, BLOCK).alias("bp"),
        F.col("dirty_name").substr(
            F.length("dirty_name") - BLOCK + 1, F.lit(BLOCK)
        ).alias("bs"),
    ).persist()
    pairs = (
        d.join(c, on="bp").select("dirty_id", "doc_id", "dirty_name", "name")
        .unionByName(
            d.join(c, on="bs").select("dirty_id", "doc_id", "dirty_name", "name")
        )
        .distinct()
    )
    from searchengine_spark.io import cut_and_release

    return cut_and_release(
        pairs.select(
            "dirty_id",
            F.col("doc_id").alias("clean_id"),
            F.levenshtein("dirty_name", "name").alias("dist"),
        ).filter(F.col("dist") <= MAX_DIST),
        c,
        d,
    )


def q_record_linkage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return link_blocked(clean_entities(docs), dirty_entities(docs))


_LINKAGE_SQL = f"""
WITH clean AS (
  SELECT doc_id, nm AS name FROM (
    SELECT doc_id,
           substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, {NAME_LEN})
             AS nm
    FROM documents
  ) t WHERE length(nm) >= {2 * BLOCK}
),
dirty AS (
  SELECT doc_id AS dirty_id,
         substr(name, 1, (doc_id % {_DEL_MOD} + 1)::INT - 1) ||
         substr(name, (doc_id % {_DEL_MOD} + 1)::INT + 1, {NAME_LEN})
           AS dirty_name
  FROM clean
),
ck AS (
  SELECT doc_id, name,
         substr(name, 1, {BLOCK}) AS bp,
         substr(name, length(name) - {BLOCK} + 1, {BLOCK}) AS bs
  FROM clean
),
dk AS (
  SELECT dirty_id, dirty_name,
         substr(dirty_name, 1, {BLOCK}) AS bp,
         substr(dirty_name, length(dirty_name) - {BLOCK} + 1, {BLOCK}) AS bs
  FROM dirty
),
pairs AS (
  SELECT DISTINCT dirty_id, doc_id, dirty_name, name FROM (
    SELECT d.dirty_id, c.doc_id, d.dirty_name, c.name
    FROM dk d JOIN ck c ON d.bp = c.bp
    UNION ALL
    SELECT d.dirty_id, c.doc_id, d.dirty_name, c.name
    FROM dk d JOIN ck c ON d.bs = c.bs
  ) u
)
SELECT dirty_id, doc_id AS clean_id,
       levenshtein(dirty_name, name)::INT AS dist
FROM pairs
WHERE levenshtein(dirty_name, name) <= {MAX_DIST}
"""

QUERIES = {"dedup_record_linkage_pairs": q_record_linkage_pairs}
ORACLES = {"dedup_record_linkage_pairs": _LINKAGE_SQL}
