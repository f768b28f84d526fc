"""Perceptual dHash: golden bits, re-encode invariance (the whole
point of hashing decoded pixels), poison-row policy, and the
pigeonhole exactness guarantee vs a brute-force reference."""

import struct
import zlib

import numpy as np
import pytest

from searchengine_spark.operators.codecs import PNG_MAGIC, encode_png
from searchengine_spark.operators.phash import (
    HAMMING_MAX,
    N_BANDS,
    SIDE,
    dhash_bits,
    dhash_neardup_pairs,
    image_dhash,
)

MEDIA_COLS = ["media_id", "media_type", "payload"]
MEDIA_DDL = "media_id long, media_type string, payload binary"


def _png_filter1(arr: np.ndarray) -> bytes:
    """Same pixels as encode_png(arr) but with Sub (type 1) filtered
    scanlines — a byte-for-byte different, equally valid PNG."""
    h, w = arr.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    lines = []
    for y in range(h):
        row = arr[y].astype(np.int64)
        prev = np.concatenate([[0], row[:-1]])
        lines.append(b"\x01" + ((row - prev) % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines), 9))
        + chunk(b"IEND", b"")
    )


def test_dhash_bits_golden():
    # Row 0: strictly increasing -> no bits. Row 1: strictly
    # decreasing -> all 7 bits of that row (indices 7..13).
    grid = np.zeros((SIDE, SIDE), dtype=np.uint8)
    grid[0] = np.arange(8)
    grid[1] = np.arange(8)[::-1]
    expected = sum(1 << (1 * 7 + j) for j in range(7))
    assert dhash_bits(grid) == expected


def test_image_dhash_matches_reference_and_survives_reencode(spark):
    rng = np.random.default_rng(7)
    grids = [rng.integers(0, 256, (SIDE, SIDE), dtype=np.uint8) for _ in range(5)]
    rows = [(i, "image", encode_png(g)) for i, g in enumerate(grids)]
    # same pixels, different PNG bytes (Sub-filtered, max compression)
    rows += [(100 + i, "image", _png_filter1(g)) for i, g in enumerate(grids)]
    assert rows[0][2] != rows[5][2]  # payloads genuinely differ
    out = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(
            spark.createDataFrame(rows, MEDIA_DDL)
        ).collect()
    }
    for i, g in enumerate(grids):
        assert out[i] == dhash_bits(g)
        assert out[100 + i] == out[i]  # re-encode invariance


def test_image_dhash_skips_poison_rows(spark):
    good = np.arange(64, dtype=np.uint8).reshape(SIDE, SIDE)
    rows = [
        (1, "image", encode_png(good)),
        (2, "image", None),                      # NULL payload
        (3, "image", b"\x89PNGnot-actually"),    # malformed
        (4, "audio", encode_png(good)),          # wrong media_type
        (5, "image", encode_png(np.zeros((4, 4), dtype=np.uint8))),  # off-size
    ]
    got = image_dhash(spark.createDataFrame(rows, MEDIA_DDL)).collect()
    assert [r["media_id"] for r in got] == [1]


def test_neardup_pairs_exact_vs_bruteforce(spark):
    # Random hashes + planted near-misses: flipping <= HAMMING_MAX
    # bits must always be found, regardless of which bands the flips
    # land in.
    rng = np.random.default_rng(11)
    sigs = [(i, int(rng.integers(0, 1 << 56))) for i in range(30)]
    base = sigs[0][1]
    for k, flips in enumerate(([0], [13, 14], [5, 19, 33]), start=100):
        h = base
        for b in flips[: k - 99]:
            h ^= 1 << b
        sigs.append((k, h))
    df = spark.createDataFrame(sigs, "media_id long, dhash long")
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in dhash_neardup_pairs(df).collect()
    }
    expect = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, b = sigs[i], sigs[j]
            d = bin(a[1] ^ b[1]).count("1")
            if d <= HAMMING_MAX:
                lo, hi = sorted((a[0], b[0]))
                expect.add((lo, hi, d))
    assert got == expect
    assert len(expect) >= 4  # the planted pairs are actually in play


def test_neardup_threshold_guard():
    with pytest.raises(ValueError):
        dhash_neardup_pairs(None, max_hamming=N_BANDS)
