"""Explicit Bloom-filter runtime join pruning (semi-join pushdown).

The 100 TB problem: `fact ⋈ dim` where dim's key set is too big to
broadcast-hash-join cheaply but small enough to SKETCH. Shuffling all
of fact to probe a few-million-key dim wastes almost the whole
exchange — the classic fix (Spark's own
`spark.sql.optimizer.runtime.bloomFilter.enabled`, Iceberg/Delta
dynamic file pruning) is to build a Bloom filter over the dim keys
and apply it as a map-side filter on fact BEFORE the shuffle. False
positives only cost a little pruning efficiency; the exact join
afterwards removes them, so the RESULT is byte-identical to the plain
join — which is exactly what makes the operator hash-provable against
a plain-SQL oracle.

Shape here: one distributed `bit_or` aggregate over the dim keys
builds the filter as ``m/64`` longs; the words are collected as a
BOUNDED sketch (≤2^17 bits = 2 KiB..16 KiB — same driver-side-sketch
budget as approxQuantile cutpoints) and baked into the fact scan as
an in-plan literal array, so the membership test (xxhash64 + shift +
mask, whole-stage codegen) runs map-side with zero extra exchange.
Beyond ~30k dim keys the cap keeps the sketch bounded and the fpp
degrades gracefully — pruning weakens but correctness never does. On
a real cluster the same words array ships as a broadcast variable
instead of plan literals; the DataFrame-literal form keeps the whole
thing declarative.

Reference parity: the reference engine has no runtime filters (its
joins are single-process polars/pandas, SURVEY §2.5); this is part of
the scale extension the brief demands.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# k=3 independent hash functions via seeded xxhash64.
BLOOM_SEEDS = (0x9E37, 0x85EB, 0xC2B2)
_MIN_BITS = 1 << 12
_MAX_BITS = 1 << 17  # 2 KiB..16 KiB of words — bounded driver sketch


def _positions(key, m_bits: int):
    """The k bit positions of a key: pmod(xxhash64(key, seed), m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)) for seed in BLOOM_SEEDS
    ]


def bloom_build(dim: DataFrame, key_col: str, *, m_bits: int = 0) -> tuple[list[int], int]:
    """Build the filter over dim's key column: one explode to the k
    positions, one ``bit_or`` aggregate per 64-bit word, one bounded
    collect. Returns (words, m_bits); ``words[i]`` holds bits
    ``[64*i, 64*i+64)``.

    Auto-sizing: next power of two ≥ 16·n_keys (≈0.3% fpp at k=3),
    clamped to [2^12, 2^17]."""
    if not m_bits:
        n = dim.select(key_col).distinct().count()
        m_bits = _MIN_BITS
        while m_bits < 16 * n and m_bits < _MAX_BITS:
            m_bits <<= 1
    n_words = m_bits // 64
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits))).alias("pos")
    word_rows = (
        dim.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    by_idx = {r["widx"]: r["word"] for r in word_rows}
    return [int(by_idx.get(i, 0)) for i in range(n_words)], m_bits


def bloom_prefilter(
    fact: DataFrame, key_col: str, words: list[int], m_bits: int
) -> DataFrame:
    """Map-side membership test on fact: ALL k bits set. Pure Column
    arithmetic — survives whole-stage codegen, adds no shuffle.

    The words array ships as a 1-row broadcast-joined array column
    (BroadcastExchange of one 2 KiB..16 KiB row), NOT as plan
    literals: a 2048-element literal array inflates the plan string
    to ~78K chars and pays real Catalyst compile time on every run
    (measured ~1.5s at m=2^17), which is pure overhead — the
    broadcast form is what a real cluster ships anyway.

    Column names ``_bfarr`` and ``_bfp0..k`` are reserved while the
    filter runs: a fact column with one of those names would make the
    condition-less join ambiguous (the pre-broadcast withColumn form
    silently REPLACED it, which was worse). Fail loudly instead."""
    reserved = {"_bfarr", *(f"_bfp{i}" for i in range(len(BLOOM_SEEDS)))}
    clash = reserved & set(fact.columns)
    if clash:
        raise ValueError(
            f"bloom_prefilter reserves column names {sorted(reserved)}; "
            f"rename fact columns {sorted(clash)} first"
        )
    spark = fact.sparkSession
    bf = spark.createDataFrame([(words,)], "_bfarr array<bigint>")
    # crossJoin, not a condition-less join: explicit 1-row broadcast
    # cartesian that keeps working under spark.sql.crossJoin.enabled=false
    out = fact.crossJoin(F.broadcast(bf))
    for i, p in enumerate(_positions(F.col(key_col), m_bits)):
        out = out.withColumn(f"_bfp{i}", p)
    tests = [
        F.expr(
            f"(_bfarr[CAST(_bfp{i} DIV 64 AS INT)]"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_bfp{i} % 64 AS INT))) != 0"
        )
        for i in range(len(BLOOM_SEEDS))
    ]
    return out.filter(reduce(lambda a, b: a & b, tests)).drop(
        "_bfarr", *[f"_bfp{i}" for i in range(len(BLOOM_SEEDS))]
    )


# ---------------------------------------------------------------------------
# registered query


def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority for high-value orders, with the
    lineitem side Bloom-pruned on the surviving order keys before the
    join. The filter is build-time state, not semantics: the exact
    equi-join deletes the false positives, so the result equals the
    plain join (the oracle) bit-for-bit."""
    from searchengine_spark.io import load_table

    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .select("o_orderkey", "o_orderpriority")
    )
    # Fixed max-width filter: 16 KiB of words regardless of dim size,
    # which skips the sizing pass (one fewer action) — auto-sizing
    # only matters when the sketch budget is tight.
    words, m_bits = bloom_build(dim, "o_orderkey", m_bits=_MAX_BITS)
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    pre = bloom_prefilter(fact, "l_orderkey", words, m_bits)
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        pre.join(dim, pre["l_orderkey"] == dim["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue.cast("decimal(28,4)")).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_BLOOM_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 450000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {"join_bloom_prefilter": q_join_bloom_prefilter}
ORACLES = {"join_bloom_prefilter": _BLOOM_SQL}
