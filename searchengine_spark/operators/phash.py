"""Perceptual image hashing (dHash) + near-duplicate image pairs.

The multimodal twin of SimHash: a 56-bit difference hash over the
decoded pixel grid, then the same banded-LSH equi-join used for text
near-dup — never an all-pairs join. The hash survives re-encoding
(any PNG filter strategy, any compressor level) because it is
computed from DECODED pixels through the real codec path
(`operators/codecs.decode_png`), so byte-level payload differences
that render identically collapse to the same fingerprint. That is the
image-dedup contract a 100 TB multimodal corpus needs: crawlers
re-compress, thumbnails get re-saved, but the pixels are the content.

dHash (Krawetz): bit(i, j) = pixel[i, j] > pixel[i, j+1] for an
8x8 greyscale grid -> 8 rows x 7 horizontal gradients = 56 bits
(fits a signed 64-bit in every engine, like simhash's 60).

Pair recall is EXACT, not approximate: the signature splits into
``N_BANDS`` disjoint bands and two hashes within Hamming distance
``HAMMING_MAX`` <= N_BANDS - 1 must agree on at least one whole band
(pigeonhole), so the banded candidate join provably finds every pair
the brute-force O(n^2) scan would. The DuckDB oracle for the pair
query is therefore the brute-force cross join itself.

Scale shape: decode+hash is an Arrow-batched mapInPandas map stage
(no shuffle); the pair join shuffles on (band, band_val) — uniform
under any real image distribution; verification is one bit_count(XOR)
per candidate. Same topology as `operators/simhash.py`.

Reference parity note: the reference engine (abh2050/searchengine)
has no image path at all; this extends the builder's multimodal
brief with the standard perceptual-dedup operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from searchengine_spark.io import ensure_min_partitions, load_table

SIDE = 8                      # square grid the hash is defined over
N_BITS = SIDE * (SIDE - 1)    # 56: 8 rows x 7 horizontal gradients
N_BANDS = 4
BAND_BITS = N_BITS // N_BANDS  # 14
# Pigeonhole: <= N_BANDS - 1 bit flips cannot dirty all N_BANDS bands,
# so banded candidates have PROVABLY exact recall at this threshold.
HAMMING_MAX = N_BANDS - 1

DHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("dhash", LongType())]
)


def dhash_bits(grid) -> int:
    """56-bit dHash of an (8, 8) uint8-ish array — pure reference
    implementation shared by the Spark kernel and the tests.

    Bit index i*7 + j is set when grid[i][j] > grid[i][j+1]."""
    h = 0
    for i in range(SIDE):
        for j in range(SIDE - 1):
            if int(grid[i][j]) > int(grid[i][j + 1]):
                h |= 1 << (i * (SIDE - 1) + j)
    return h


def image_dhash(media: DataFrame) -> DataFrame:
    """(media_id, dhash) for every decodable SIDE x SIDE greyscale
    image payload. Non-image rows, NULL payloads, malformed blobs and
    off-size images are dropped (poison blobs must never kill the
    job — same policy as multimodal.decode_media), not nulled, so the
    output is exactly the hashable population.

    Arrow-batched mapInPandas, map-only: the expensive part (inflate +
    unfilter + 56 comparisons) runs where the bytes already are.
    """
    import numpy as np

    from searchengine_spark.operators.codecs import decode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for mid, mt, p in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "image" or p is None:
                    continue
                try:
                    w, h, c, arr = decode_png(bytes(p))
                except ValueError:
                    continue
                if (w, h, c) != (SIDE, SIDE, 1):
                    continue
                grid = arr.reshape(SIDE, SIDE).astype(np.int64)
                # vectorized twin of dhash_bits
                bits = (grid[:, :-1] > grid[:, 1:]).reshape(-1)
                weights = np.int64(1) << np.arange(N_BITS, dtype=np.int64)
                ids.append(mid)
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return media.mapInPandas(batches, DHASH_SCHEMA)


def dhash_bands(signatures: DataFrame) -> DataFrame:
    """(media_id, band, band_val) — 14-bit slices for the LSH join."""
    mask = (1 << BAND_BITS) - 1
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("dhash", b * BAND_BITS)
            .bitwiseAND(F.lit(mask))
            .alias("band_val"),
        )
        for b in range(N_BANDS)
    ]
    return signatures.select(
        "media_id", F.explode(F.array(*bands)).alias("bb")
    ).select("media_id", "bb.band", "bb.band_val")


def dhash_neardup_pairs(
    signatures: DataFrame, *, max_hamming: int = HAMMING_MAX
) -> DataFrame:
    """(media_a, media_b, hamming) — every pair within ``max_hamming``.

    Exact (not approximate) as long as max_hamming <= N_BANDS - 1:
    banded equi-join for candidates, bit_count(XOR) to verify. Larger
    thresholds would need more bands to keep the recall guarantee —
    asserted here rather than silently degraded.
    """
    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole recall "
            f"guarantee with {N_BANDS} bands (need <= {N_BANDS - 1})"
        )
    bands = dhash_bands(signatures)
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("media_a"),
            F.col("r.media_id").alias("media_b"),
        )
        .distinct()
    )
    sig_a = signatures.select(
        F.col("media_id").alias("media_a"), F.col("dhash").alias("sig_a")
    )
    sig_b = signatures.select(
        F.col("media_id").alias("media_b"), F.col("dhash").alias("sig_b")
    )
    return (
        cand.join(sig_a, "media_a")
        .join(sig_b, "media_b")
        .select(
            "media_a",
            "media_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------- queries

def _document_dhashes(spark, sf_dir: str) -> DataFrame:
    from searchengine_spark.operators.multimodal import png2d_media_from_documents

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return image_dhash(png2d_media_from_documents(docs))


def q_image_dhash(spark, sf_dir: str) -> DataFrame:
    """documents -> real 8x8 PNG encode -> real decode -> 56-bit
    dHash. Every bit is exact integer arithmetic on the text bytes
    (pixel k = ascii/'replace' byte k, '?'-padded), so the DuckDB
    oracle restates the whole chain from `documents` without touching
    a codec."""
    return _document_dhashes(spark, sf_dir)


def q_image_dhash_neardup(spark, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs at Hamming <= 3 of 56. The banded
    join is provably exhaustive at this threshold (pigeonhole), so the
    oracle is the brute-force all-pairs scan — if the LSH shape lost a
    pair, the hash comparison would catch it."""
    return dhash_neardup_pairs(_document_dhashes(spark, sf_dir))


QUERIES = {
    "mm_image_dhash": q_image_dhash,
    "mm_image_dhash_neardup": q_image_dhash_neardup,
}

# Pixel restatement convention copied from the mm_png_* oracles
# (multimodal.py): first 64 CHARACTERS of text, codepoint with
# non-ASCII -> 63 ('?', Python ascii/'replace'), right-padded with 63.
_DHASH_CTE = """
        chars AS (
          SELECT doc_id,
                 CASE WHEN length(substr(COALESCE(text, ''), 1, 64)) = 0
                      THEN []::INT[]
                      ELSE list_transform(
                             split(substr(COALESCE(text, ''), 1, 64), ''),
                             c -> CASE WHEN unicode(c) > 127 THEN 63 ELSE unicode(c) END
                           )
                 END AS b
          FROM documents
        ),
        px AS (
          SELECT doc_id, i.range AS idx,
                 CASE WHEN i.range < len(b) THEN b[i.range + 1] ELSE 63 END AS v
          FROM chars, range(64) i
        ),
        hashes AS (
          SELECT l.doc_id AS media_id,
                 SUM(CASE WHEN l.v > r.v
                          THEN (1::BIGINT << ((l.idx // 8) * 7 + (l.idx % 8)))
                          ELSE 0 END) AS dhash
          FROM px l JOIN px r
            ON l.doc_id = r.doc_id AND r.idx = l.idx + 1 AND l.idx % 8 < 7
          GROUP BY l.doc_id
        )
"""

ORACLES = {
    "mm_image_dhash": f"""
        WITH {_DHASH_CTE}
        SELECT media_id, CAST(dhash AS BIGINT) AS dhash FROM hashes
    """,
    "mm_image_dhash_neardup": f"""
        WITH {_DHASH_CTE}
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               CAST(bit_count(xor(CAST(a.dhash AS BIGINT),
                                  CAST(b.dhash AS BIGINT))) AS INT) AS hamming
        FROM hashes a JOIN hashes b ON a.media_id < b.media_id
        WHERE bit_count(xor(CAST(a.dhash AS BIGINT),
                            CAST(b.dhash AS BIGINT))) <= {HAMMING_MAX}
    """,
}
