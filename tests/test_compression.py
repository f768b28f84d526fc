"""Varint cost ladder vs a real LEB128 encoder, plus layout bounds."""

from pyspark.sql import functions as F

from searchengine_spark.index.compression import (
    q_postings_varint_compression,
    varint_bytes,
)


def _leb128_len(n: int) -> int:
    out = 1
    n >>= 7
    while n:
        out += 1
        n >>= 7
    return out


def test_varint_ladder_matches_real_leb128(spark):
    samples = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**28 - 1, 2**28]
    df = spark.createDataFrame([(s,) for s in samples], "g bigint").select(
        "g", varint_bytes(F.col("g")).alias("nb")
    )
    for r in df.collect():
        assert r["nb"] == _leb128_len(r["g"]), r["g"]


def test_compression_bounds(spark, sf_dir):
    rows = q_postings_varint_compression(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # each entry costs 1..5 varint bytes vs 8 raw
        assert r["n_docs"] <= r["varint_bytes"] <= 5 * r["n_docs"]
        assert r["raw_bytes"] == 8 * r["n_docs"]
        assert 1.6 - 1e-9 <= r["compression_ratio"] <= 8.0 + 1e-9
