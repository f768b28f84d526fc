"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Representation: media is an opaque `binary` payload column plus a
typed metadata struct (media_type, width/height or sample_rate,
n_frames, ...). All heavy per-item work (decode, feature extraction,
resizing, frame sampling) runs through `mapInPandas` — Arrow-batched
iterator UDFs, the only sane shape for multi-MB blobs: one Python
round trip per batch, bounded memory via the iterator protocol, and
partition-parallel across the cluster.

REAL vs FAKE formats: decode_media sniffs magic bytes per item.
Real PNG images and RIFF/WAVE audio decode through the stdlib-only
codecs in operators/codecs.py (zlib+struct+numpy against the
published specs; Pillow is used instead when importable, adding
JPEG). Payloads in the deterministic fake header format below (used
by tests and the video path, where no stdlib codec exists) take the
header fast path:

    bytes 0:2  magic b"IM" / b"AU" / b"VI"
    bytes 2:6  width / sample_rate / n_frames   (big-endian uint32)
    bytes 6:10 height / n_samples / frame_size  (big-endian uint32)
    rest       payload

Video: the pipeline is real end to end for MJPEG-in-AVI —
sample_frames demuxes RIFF/AVI payloads with codecs.demux_avi
(chunk-walk per the published AVI RIFF spec) and decode_frame_pixels
decodes each sampled '##dc' chunk with the baseline-JPEG spec
decoder (operators/jpeg.py), MJPEG being exactly per-frame JPEG.
Inter-frame codecs (H.264 etc.) still need a codec library (pyav)
and stay behind the decode_real_media guard.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("dim_a", IntegerType()),      # width / sample_rate / n_frames
        StructField("dim_b", IntegerType()),      # height / n_samples / frame_size
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),   # stand-in "feature"
    ]
)


def encode_fake_media(media_type: str, dim_a: int, dim_b: int, payload: bytes) -> bytes:
    magic = {"image": b"IM", "audio": b"AU", "video": b"VI"}[media_type]
    return magic + struct.pack(">II", dim_a, dim_b) + payload


def decode_real_media(payload: bytes, media_type: str) -> dict:
    """Decode a REAL media payload (PNG image / WAV audio; JPEG too
    when Pillow is importable) into the DECODED_SCHEMA fields."""
    from searchengine_spark.operators.codecs import decode_any

    out = decode_any(payload)
    if out is None:
        raise NotImplementedError(
            f"unrecognized {media_type} payload; built-in codecs cover "
            "PNG, baseline JPEG, RIFF/WAVE (PCM16), and MJPEG-in-AVI "
            "(per-frame pixel decode) — install pyav for other video "
            "codecs (H.264 etc.) and keep the mapInPandas dataflow "
            "unchanged"
        )
    return out


def _decode_header(payload: bytes) -> tuple[int, int]:
    if payload is None or len(payload) < 10:
        return (0, 0)
    return struct.unpack(">II", payload[2:10])


def decode_media(media: DataFrame) -> DataFrame:
    """Binary payloads -> typed metadata + a cheap content feature.

    Per item: sniff magic bytes; real PNG/WAV payloads go through the
    stdlib codecs (operators/codecs.py), fake-header payloads through
    the header fast path. A malformed payload yields a (0,0,0,0.0)
    row instead of failing the batch — at 100 TB a poison blob must
    never kill the job.

    mapInPandas: batches arrive as pandas DataFrames (Arrow), the
    generator yields result batches — memory stays bounded no matter
    how large the partition is.
    """
    from searchengine_spark.operators.codecs import decode_any

    int32_max = (1 << 31) - 1

    def decode_one(payload) -> tuple[int, int, int, float]:
        try:
            real = decode_any(payload)
        except Exception:  # noqa: BLE001 — corrupt real-format payloads
            # raise zlib.error / struct.error / ValueError depending on
            # where they're malformed; ANY decode failure must yield a
            # zero row, never kill the task.
            return (0, 0, 0, 0.0)
        if real is not None:
            return (
                min(real["dim_a"], int32_max),
                min(real["dim_b"], int32_max),
                min(real["n_bytes"], int32_max),
                real["mean_byte"],
            )
        a, b = _decode_header(payload)
        body = payload[10:] if payload is not None and len(payload) > 10 else b""
        return (
            min(a, int32_max),
            min(b, int32_max),
            len(body),
            float(sum(body)) / len(body) if len(body) else 0.0,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(decode_one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "dim_a": decoded.map(lambda d: d[0]).astype("int32"),
                    "dim_b": decoded.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": decoded.map(lambda d: d[2]).astype("int32"),
                    "mean_byte": decoded.map(lambda d: d[3]),
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(video: DataFrame, *, every_nth: int = 2) -> DataFrame:
    """Deterministic frame sampling for video payloads.

    RIFF/AVI payloads go through the REAL container demuxer
    (codecs.demux_avi — chunk-walks hdrl/movi per the published AVI
    RIFF spec and returns per-frame byte payloads); fake 'VI'-header
    payloads take the header fast path. For MJPEG content, feed the
    exploded (media_id, frame_no, frame) output to
    decode_frame_pixels for full pixel decode via the baseline-JPEG
    spec decoder; inter-frame codecs (H.264) would swap a pyav call
    into the same shape.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from searchengine_spark.operators.codecs import demux_avi

        for pdf in it:
            out_ids, out_nos, out_frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) < 10:
                    continue
                if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                    # REAL container demux (codecs.demux_avi): every
                    # '##dc'/'##db' chunk of the movi LIST in stream
                    # order. A corrupt container must skip the row,
                    # never kill the task.
                    try:
                        avi_frames = demux_avi(payload)["frames"]
                    except Exception:  # noqa: BLE001
                        continue
                    for k in range(0, len(avi_frames), every_nth):
                        out_ids.append(mid)
                        out_nos.append(k)
                        out_frames.append(avi_frames[k])
                    continue
                if payload[:2] != b"VI":
                    continue
                n_frames, frame_size = struct.unpack(">II", payload[2:10])
                body = payload[10:]
                if frame_size == 0:
                    continue
                # Clamp to what the body actually holds: a malformed
                # header declaring billions of frames must not drive
                # the loop past the real payload.
                n_frames = min(n_frames, len(body) // frame_size)
                for k in range(0, n_frames, every_nth):
                    start = k * frame_size
                    out_ids.append(mid)
                    out_nos.append(k)
                    out_frames.append(bytes(body[start : start + frame_size]))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame": out_frames}
            ).astype({"frame_no": "int32"}, errors="ignore")

    return video.mapInPandas(batches, FRAME_SCHEMA)


FRAME_PIXEL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def decode_frame_pixels(frames: DataFrame) -> DataFrame:
    """Per-frame PIXEL decode for MJPEG frames: (media_id, frame_no,
    frame bytes) -> (media_id, frame_no, width, height, mean_pixel).

    This closes the video pipeline end to end with zero external
    dependencies: codecs.demux_avi walks the RIFF/AVI container
    (sample_frames), and each sampled '##dc' chunk is a baseline JPEG
    decoded by the spec decoder in operators/jpeg.py (DQT/DHT/SOF0
    parse -> Huffman -> dequantize -> IDCT). MJPEG *is* per-frame
    JPEG, so no inter-frame state is needed — each frame decodes
    independently, which is exactly why this stays a map-only
    mapInPandas stage that scales linearly. A corrupt or non-JPEG
    frame yields a (0, 0, 0.0) row, never a task failure.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from searchengine_spark.operators.jpeg import decode_jpeg

        for pdf in it:
            ws, hs, means = [], [], []
            for f in pdf["frame"]:
                try:
                    w, h, px = decode_jpeg(bytes(f))
                    ws.append(w)
                    hs.append(h)
                    means.append(float(px.mean()))
                except Exception:  # noqa: BLE001 — poison frame -> zero row
                    ws.append(0)
                    hs.append(0)
                    means.append(0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_no": pdf["frame_no"].astype("int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_pixel": means,
                }
            )

    return frames.mapInPandas(batches, FRAME_PIXEL_SCHEMA)


def resize_images(media: DataFrame, *, scale_num: int = 1, scale_den: int = 2) -> DataFrame:
    """Nearest-neighbor resize over the fake format: dims scale by
    num/den; the body is resampled by index mapping (out byte i <-
    in byte i*den//num) — the 1-D analogue of nearest-neighbor image
    scaling, exact for downscale AND upscale, deterministic and
    schema-true. Real decoder swap-in: replace the index map with PIL
    `Image.resize`; the mapInPandas batch shape, the (media_id,
    media_type, payload) contract, and the downstream decode
    compatibility are exactly what the real kernel needs.
    """
    if scale_num < 1 or scale_den < 1:
        raise ValueError("scale must be a positive ratio")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mt, p in zip(pdf["media_type"], pdf["payload"]):
                # non-image and NULL rows pass through untouched —
                # re-encoding them with the image magic would corrupt
                # their headers while media_type still said otherwise.
                if mt != "image" or p is None:
                    out.append(p)
                    continue
                w, h = _decode_header(p)
                body = p[10:] if len(p) > 10 else b""
                n_out = len(body) * scale_num // scale_den
                resampled = bytes(
                    body[i * scale_den // scale_num] for i in range(n_out)
                )
                out.append(
                    encode_fake_media(
                        "image",
                        w * scale_num // scale_den,
                        h * scale_num // scale_den,
                        resampled,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


FEATURE_DIM = 8


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stub: an 8-dim byte-histogram 'embedding'
    per item (bucketed byte counts, L1-normalized) — deterministic,
    so tests can assert exact values. Real kernel swap-in: a vision/
    audio model forward pass per Arrow batch; the output contract
    (media_id, array<float>) feeds the similarity/ANN operators
    unchanged (cosine_topk, build_ann_index, build_ivf_index).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                body = p[10:] if p is not None and len(p) > 10 else b""
                hist = [0.0] * FEATURE_DIM
                for b in body:
                    hist[b * FEATURE_DIM // 256] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def fake_media_from_documents(docs: DataFrame, *, body_chars: int = 16) -> DataFrame:
    """Derive a deterministic media table from the documents table:
    payload = fake-image header (dims = n_chars x doc_id%1000) + the
    first `body_chars` ASCII bytes of the text. Lets the full
    encode->decode mapInPandas plumbing run against real testdata —
    and, because the construction is deterministic, the decoded
    output is oracle-checkable from `documents` directly."""

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": [
                        encode_fake_media(
                            "image",
                            0 if pd.isna(n) else int(n),
                            int(d) % 1000,
                            (t or "")[:body_chars].encode("ascii", "replace"),
                        )
                        for d, n, t in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"])
                    ],
                }
            )

    return docs.select("doc_id", "n_chars", "text").mapInPandas(encode, MEDIA_SCHEMA)


def png_media_from_documents(docs: DataFrame, *, body_chars: int = 16) -> DataFrame:
    """Derive REAL PNG payloads from the documents table: each doc's
    first `body_chars` ASCII bytes become a 1 x N 8-bit greyscale
    image written by the stdlib PNG encoder. Deterministic, so the
    decoded output is oracle-checkable from `documents` directly —
    proving the real compress -> decompress -> unfilter codec path
    end to end, not just the dataflow."""
    import numpy as np

    from searchengine_spark.operators.codecs import encode_png

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                body = (t or "")[:body_chars].encode("ascii", "replace") or b"?"
                payloads.append(
                    encode_png(np.frombuffer(body, dtype=np.uint8).reshape(1, -1))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(encode, MEDIA_SCHEMA)


RESIZE_SIDE = 8  # square source images for the resize chain


def png2d_media_from_documents(
    docs: DataFrame, *, side: int = RESIZE_SIDE
) -> DataFrame:
    """REAL square PNGs from documents: the first side*side
    ascii/'replace' bytes of text, RIGHT-PADDED with '?' (63) to a
    full side x side greyscale image. The padding makes every image
    the same shape, so the resize oracle needs no ragged-edge
    cases (unlike the 1 x N family, where empty text is one byte)."""
    import numpy as np

    from searchengine_spark.operators.codecs import encode_png

    n = side * side

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                body = (t or "")[:n].encode("ascii", "replace").ljust(n, b"?")
                payloads.append(
                    encode_png(
                        np.frombuffer(body, dtype=np.uint8).reshape(side, side)
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(encode, MEDIA_SCHEMA)


def resize_media_box2(media: DataFrame) -> DataFrame:
    """REAL image downscale by 2: decode PNG -> 2x2 box filter with
    exact integer arithmetic (out pixel = block_sum // 4) -> re-encode
    PNG. The whole decode -> resample -> encode kernel is an
    Arrow-batched mapInPandas map stage — embarrassingly parallel,
    no shuffle, the same shape a Pillow/libvips kernel would use at
    100 TB (and `decode_png` already prefers Pillow when present).

    Non-image / NULL / malformed payloads pass through untouched —
    a poison blob must never kill the job (same policy as
    decode_media). Odd dimensions drop the trailing row/col (the
    standard floor-size convention)."""
    import numpy as np

    from searchengine_spark.operators.codecs import decode_png, encode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mt, p in zip(pdf["media_type"], pdf["payload"]):
                if mt != "image" or p is None:
                    out.append(p)
                    continue
                try:
                    w, h, c, arr = decode_png(bytes(p))
                except ValueError:
                    out.append(p)
                    continue
                h2, w2 = h // 2, w // 2
                if h2 == 0 or w2 == 0:
                    out.append(p)
                    continue
                clipped = arr[: h2 * 2, : w2 * 2].astype(np.int64)
                small = (
                    clipped.reshape(h2, 2, w2, 2, c).sum(axis=(1, 3)) // 4
                ).astype(np.uint8)
                out.append(encode_png(small.squeeze(-1) if c == 1 else small))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def q_png_resize_stats(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query for the full real-codec image chain:
    documents -> 8x8 PNG encode -> decode + 2x2 box resize +
    re-encode -> decode -> typed stats. Every pixel of the final
    4x4 image is exact integer arithmetic on the text bytes, so the
    DuckDB oracle restates the whole chain from `documents`."""
    from searchengine_spark.io import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    resized = resize_media_box2(png2d_media_from_documents(docs))
    return decode_media(resized).select(
        "media_id",
        "media_type",
        "dim_a",
        "dim_b",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


def jpeg_media_from_documents(docs: DataFrame, *, side: int = 8) -> DataFrame:
    """REAL baseline JPEGs from documents: a constant side x side
    greyscale image whose every pixel is the code of the doc's FIRST
    ascii/'replace' character ('?' = 63 for empty/NULL text).

    Constant content is the deliberate choice that keeps the LOSSY
    codec oracle-checkable: a constant block's DCT has one nonzero
    coefficient, so the whole quantize -> dequantize -> IDCT pipeline
    collapses to a scalar closed form the DuckDB oracle can restate
    (operators/jpeg.py:constant_block_decode_value). Non-constant
    content is exercised by tests/test_jpeg.py's exact bitstream
    round-trip instead."""
    import numpy as np

    from searchengine_spark.operators.jpeg import encode_jpeg

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                first = ((t or "")[:1].encode("ascii", "replace") or b"?")[0]
                payloads.append(
                    encode_jpeg(np.full((side, side), first, dtype=np.uint8))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(encode, MEDIA_SCHEMA)


def q_jpeg_decode_stats(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query over the REAL lossy codec: documents ->
    baseline JPEG encode (DCT + quantize + Huffman) -> decode_media
    sniffs the JPEG magic and runs the spec decoder -> typed stats."""
    from searchengine_spark.io import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    decoded = decode_media(jpeg_media_from_documents(docs))
    return decoded.select(
        "media_id",
        "media_type",
        "dim_a",
        "dim_b",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


WAV_SAMPLES = 32       # samples derived per document
WAV_WINDOW = 8         # frame size for the energy windows
WAV_RATE = 16000


def wav_media_from_documents(docs: DataFrame, *, n: int = WAV_SAMPLES) -> DataFrame:
    """REAL PCM16 WAVs from documents: the first n ascii/'replace'
    character codes become int16 samples s = (code - 64) * 256
    (zero-centred around '@'; empty/NULL text -> the single '?'
    sample). Deterministic, so audio features decode back to a pure
    function of the text the oracle can restate."""
    import numpy as np

    from searchengine_spark.operators.codecs import encode_wav

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                body = (t or "")[:n].encode("ascii", "replace") or b"?"
                samples = (
                    np.frombuffer(body, dtype=np.uint8).astype(np.int16) - 64
                ) * 256
                payloads.append(encode_wav(samples, sample_rate=WAV_RATE))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "audio",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(encode, MEDIA_SCHEMA)


WAV_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("n_windows", IntegerType()),
        StructField("total_energy", LongType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


def wav_features(media: DataFrame) -> DataFrame:
    """Classic audio front-end features over REAL decoded PCM:
    windowed energy (sum of squares over full WAV_WINDOW frames,
    exact bigint) and the zero-crossing count (strict sign flips).
    Decode + featurize is one Arrow-batched map stage; malformed
    payloads yield a zero row (poison-blob policy)."""
    import numpy as np

    from searchengine_spark.operators.codecs import decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, _ch, nf, frames = decode_wav(bytes(p))
                    s = frames[:, 0].astype(np.int64)
                    n_win = len(s) // WAV_WINDOW
                    full = s[: n_win * WAV_WINDOW]
                    energy = int((full * full).sum())
                    zcr = int(np.sum(s[:-1] * s[1:] < 0))
                    rows.append((int(mid), rate, len(s), n_win, energy, zcr))
                except Exception:  # noqa: BLE001 — poison blob
                    rows.append((int(mid), 0, 0, 0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "n_windows",
                    "total_energy",
                    "zero_crossings",
                ],
            )

    return media.mapInPandas(batches, WAV_FEATURES_SCHEMA)


def q_wav_features(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query for the audio path: documents -> PCM16
    WAV encode -> RIFF walk + decode -> windowed energy + ZCR."""
    from searchengine_spark.io import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return wav_features(wav_media_from_documents(docs))


import math as _math

# DFT band energies over the 32-sample clips: bins (cycles per clip)
# and their cos/sin coefficient tables, computed ONCE in Python and
# embedded as literals in BOTH engines (libm cos/sin are not
# bit-stable across engines — the evaluation.py DISCOUNTS precedent).
SPECTRAL_BINS = (1, 2, 4, 8)
_SPECTRAL_COS = {
    k: [_math.cos(2.0 * _math.pi * k * i / WAV_SAMPLES) for i in range(WAV_SAMPLES)]
    for k in SPECTRAL_BINS
}
_SPECTRAL_SIN = {
    k: [_math.sin(2.0 * _math.pi * k * i / WAV_SAMPLES) for i in range(WAV_SAMPLES)]
    for k in SPECTRAL_BINS
}


def wav_decoded_samples(media: DataFrame) -> DataFrame:
    """(media_id, samples array<int>) through the REAL RIFF/WAV
    decoder — the decode half only; feature arithmetic stays JVM-side
    so both engines share one evaluation order."""
    import numpy as np

    from searchengine_spark.operators.codecs import decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _rate, _ch, _nf, frames = decode_wav(bytes(p))
                    rows.append(
                        (int(mid), [int(v) for v in frames[:, 0].astype(np.int64)])
                    )
                except Exception:  # noqa: BLE001 — poison blob
                    rows.append((int(mid), []))
            yield pd.DataFrame(rows, columns=["media_id", "samples"])

    return media.mapInPandas(batches, "media_id long, samples array<int>")


def wav_spectral_bins(media: DataFrame) -> DataFrame:
    """Per-clip DFT power in SPECTRAL_BINS: P_k = C_k^2 + S_k^2 with
    C_k = sum_i s_i cos(2*pi*k*i/N), S_k likewise — the Goertzel/DFT
    filter-bank front-end (the first stage of MFCC pipelines,
    public). Full-length clips only (N = WAV_SAMPLES), so one shared
    coefficient table covers every row.

    Determinism: coefficients are Python-float literals identical in
    both engines; C_k/S_k are LEFT-TO-RIGHT sequential folds
    (F.aggregate walks the array in order; the SQL twin spells the
    same 32-term left-associated sum), so the doubles are
    bit-identical — the EWMA fixed-order convention. Map-only: decode
    + per-row arithmetic, no shuffle at any scale."""
    samples = wav_decoded_samples(media).filter(
        F.size("samples") == WAV_SAMPLES
    )

    def _fold(coeffs: list[float]) -> F.Column:
        pairs = F.zip_with(
            F.col("samples"),
            F.array(*[F.lit(c) for c in coeffs]),
            lambda s, c: s.cast("double") * c,
        )
        return F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)

    cols = [F.col("media_id"), F.size("samples").alias("n_samples")]
    for k in SPECTRAL_BINS:
        # integer-exact output: C/S round to bigint via floor(x+0.5)
        # (pure IEEE ops, bit-identical in both engines — a round(p,4)
        # of the raw double hit engine-round disagreements at decimal
        # boundaries), then the power is exact integer arithmetic
        c = F.floor(_fold(_SPECTRAL_COS[k]) + F.lit(0.5)).cast("bigint")
        s = F.floor(_fold(_SPECTRAL_SIN[k]) + F.lit(0.5)).cast("bigint")
        cols.append((c * c + s * s).alias(f"p{k}"))
    return samples.select(*cols)


def q_wav_spectral_bins(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query: documents -> real WAV encode -> real
    decode -> DFT filter-bank energies."""
    from searchengine_spark.io import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return wav_spectral_bins(wav_media_from_documents(docs))


def q_png_decode_stats(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query over the REAL codec: documents -> PNG
    encode (zlib/DEFLATE) -> decode_media sniffs the PNG magic and
    runs the spec decoder -> typed stats."""
    from searchengine_spark.io import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    decoded = decode_media(png_media_from_documents(docs))
    return decoded.select(
        "media_id",
        "media_type",
        "dim_a",
        "dim_b",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


VIDEO_SIDE = 8        # MJPEG frame dims (one 8x8 JPEG block)
VIDEO_FRAMES = 4      # frames per synthetic video
VIDEO_EVERY_NTH = 2   # sampling stride in the contract query


def mjpeg_avi_media_from_documents(
    docs: DataFrame, *, side: int = VIDEO_SIDE, n_frames: int = VIDEO_FRAMES
) -> DataFrame:
    """REAL MJPEG-in-AVI videos from documents: frame k is a constant
    side x side greyscale baseline JPEG whose pixel value is the
    ascii/'replace' code of the (k+1)-th character of the doc's text
    ('?' = 63 past the end or for NULL text), muxed into a
    spec-conformant RIFF/AVI container (codecs.encode_avi).

    Constant frames keep the LOSSY pipeline oracle-checkable end to
    end — same closed form as jpeg_media_from_documents
    (operators/jpeg.py:constant_block_decode_value); non-constant
    MJPEG content is exercised by the round-trip test instead."""
    import numpy as np

    from searchengine_spark.operators.codecs import encode_avi
    from searchengine_spark.operators.jpeg import encode_jpeg

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # 256 possible constant frames per side: encode each at most
        # once per batch (the per-frame JPEG encode is the hot cost).
        frame_cache: dict[int, bytes] = {}

        def frame_for(c: int) -> bytes:
            f = frame_cache.get(c)
            if f is None:
                f = frame_cache[c] = encode_jpeg(
                    np.full((side, side), c, dtype=np.uint8)
                )
            return f

        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                codes = (t or "").encode("ascii", "replace")[:n_frames]
                codes = codes + b"?" * (n_frames - len(codes))
                payloads.append(
                    encode_avi(
                        [frame_for(c) for c in codes], width=side, height=side
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "video",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(encode, MEDIA_SCHEMA)


def q_video_frame_pixel_stats(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query for the FULL video pipeline: documents ->
    MJPEG-in-AVI mux -> container demux + frame sampling (every 2nd
    frame) -> per-frame baseline-JPEG pixel decode -> typed stats.
    Three chained mapInPandas stages, all map-only (no shuffle)."""
    from searchengine_spark.io import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    videos = mjpeg_avi_media_from_documents(docs)
    frames = sample_frames(videos, every_nth=VIDEO_EVERY_NTH)
    return decode_frame_pixels(frames).select(
        "media_id",
        "frame_no",
        "width",
        "height",
        F.round("mean_pixel", 6).alias("mean_pixel"),
    )


def q_video_decode_stats(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query for COMPRESSED-video pixel decode through
    the generic media path (round-10 verdict item 5): documents ->
    MJPEG-in-AVI mux -> decode_media, whose AVI branch now demuxes the
    container AND pixel-decodes every baseline-JPEG frame (codecs.py
    decode_any), -> typed stats over DECODED pixels. Each constant
    frame collapses to the same closed form as mm_jpeg_decode_stats,
    so the whole lossy chain is oracle-checkable."""
    from searchengine_spark.io import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    decoded = decode_media(mjpeg_avi_media_from_documents(docs))
    return decoded.select(
        "media_id",
        "media_type",
        "dim_a",
        "dim_b",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


def q_media_decode_stats(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query: documents -> fake media -> decode ->
    typed stats. Exercises both mapInPandas stages end to end."""
    from searchengine_spark.io import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    media = fake_media_from_documents(docs)
    decoded = decode_media(media)
    return decoded.select(
        "media_id",
        "media_type",
        "dim_a",
        "dim_b",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


QUERIES = {
    "mm_media_decode_stats": q_media_decode_stats,
    "mm_png_decode_stats": q_png_decode_stats,
    "mm_png_resize_stats": q_png_resize_stats,
    "mm_jpeg_decode_stats": q_jpeg_decode_stats,
    "mm_video_decode_stats": q_video_decode_stats,
    "mm_wav_features": q_wav_features,
    "mm_video_frame_pixel_stats": q_video_frame_pixel_stats,
    "mm_wav_spectral_bins": q_wav_spectral_bins,
}


def _spectral_sql() -> str:
    """DuckDB twin: reconstruct the samples from text (the audio
    encode is a pure text function), then the SAME left-associated
    32-term folds with the SAME coefficient literals."""

    def fold(coeffs: list[float]) -> str:
        # Coefficients enter as STRING -> DOUBLE casts: DuckDB parses
        # a bare float literal as DECIMAL, whose decimal->double
        # conversion can land 1 ulp off the repr-roundtripped Python
        # double; string->double parsing is correctly rounded and
        # therefore bit-identical to F.lit's.
        return " + ".join(
            f"CAST((bytes[{i + 1}] - 64) * 256 AS DOUBLE) * '{c!r}'::DOUBLE"
            for i, c in enumerate(coeffs)
        )

    fold_cols = ",\n         ".join(
        f"CAST(floor(({fold(_SPECTRAL_COS[k])}) + 0.5) AS BIGINT) AS c_{k},\n"
        f"         CAST(floor(({fold(_SPECTRAL_SIN[k])}) + 0.5) AS BIGINT) AS s_{k}"
        for k in SPECTRAL_BINS
    )
    powers = ", ".join(
        f"c_{k} * c_{k} + s_{k} * s_{k} AS p{k}" for k in SPECTRAL_BINS
    )
    return f"""
        WITH body AS (
          SELECT doc_id,
                 CASE WHEN length(substr(COALESCE(text, ''), 1, {WAV_SAMPLES})) = 0
                      THEN [63]
                      ELSE list_transform(
                             split(substr(COALESCE(text, ''), 1, {WAV_SAMPLES}), ''),
                             c -> CASE WHEN unicode(c) > 127 THEN 63 ELSE unicode(c) END
                           )
                 END AS bytes
          FROM documents
        ),
        clips AS (SELECT doc_id, bytes FROM body WHERE len(bytes) = {WAV_SAMPLES}),
        folds AS (
          SELECT doc_id,
         {fold_cols}
          FROM clips
        )
        SELECT doc_id AS media_id, {WAV_SAMPLES}::INT AS n_samples, {powers}
        FROM folds
    """

# The fake payload body is the first 16 bytes of text encoded with
# Python's ascii/'replace' (each non-ASCII character -> one '?' = 63;
# NULL text -> empty body). The oracles mirror those replacement
# semantics exactly — the synthetic corpus is pure-ASCII non-NULL
# today, but testdata has drifted between driver rounds before, and
# an oracle that silently assumes ASCII would break with it.
ORACLES = {
    "mm_wav_spectral_bins": _spectral_sql(),
    "mm_media_decode_stats": """
        WITH body AS (
          -- split('', '') is [''] in DuckDB, not []: guard empty text
          SELECT doc_id, n_chars,
                 CASE WHEN length(substr(COALESCE(text, ''), 1, 16)) = 0
                      THEN []::INT[]
                      ELSE list_transform(
                             split(substr(COALESCE(text, ''), 1, 16), ''),
                             c -> CASE WHEN unicode(c) > 127 THEN 63 ELSE unicode(c) END
                           )
                 END AS bytes
          FROM documents
        )
        SELECT doc_id AS media_id, 'image' AS media_type,
               COALESCE(n_chars, 0)::INT AS dim_a, (doc_id % 1000)::INT AS dim_b,
               len(bytes)::INT AS n_bytes,
               round(COALESCE(list_sum(bytes) * 1.0 / NULLIF(len(bytes), 0), 0.0), 6)
                 AS mean_byte
        FROM body
    """,
    # Real-PNG twin: 1 x N greyscale image of the first 16
    # ascii/'replace' bytes; width == n_bytes == len, height == 1,
    # mean pixel == mean byte. Empty/NULL text encodes as the single
    # byte '?' (63).
    "mm_png_decode_stats": """
        WITH body AS (
          SELECT doc_id,
                 CASE WHEN length(substr(COALESCE(text, ''), 1, 16)) = 0 THEN [63]
                      ELSE list_transform(
                             split(substr(COALESCE(text, ''), 1, 16), ''),
                             c -> CASE WHEN unicode(c) > 127 THEN 63 ELSE unicode(c) END
                           )
                 END AS bytes
          FROM documents
        )
        SELECT doc_id AS media_id, 'image' AS media_type,
               len(bytes)::INT AS dim_a, CAST(1 AS INT) AS dim_b,
               len(bytes)::INT AS n_bytes,
               round(list_sum(bytes) * 1.0 / len(bytes), 6) AS mean_byte
        FROM body
    """,
    # Audio twin: samples s_i = (code_i - 64) * 256 from the first 32
    # ascii/'replace' bytes ('?' for empty); total_energy sums s^2
    # over FULL 8-sample windows only; zero_crossings counts strict
    # sign flips between consecutive samples. All exact integers.
    "mm_wav_features": f"""
        WITH body AS (
          SELECT doc_id,
                 CASE WHEN length(substr(COALESCE(text, ''), 1, {WAV_SAMPLES})) = 0
                      THEN [63]
                      ELSE list_transform(
                             split(substr(COALESCE(text, ''), 1, {WAV_SAMPLES}), ''),
                             c -> CASE WHEN unicode(c) > 127 THEN 63 ELSE unicode(c) END
                           )
                 END AS codes
          FROM documents
        ),
        s AS (
          SELECT doc_id, generate_subscripts(codes, 1) - 1 AS idx,
                 CAST((unnest(codes) - 64) * 256 AS BIGINT) AS v,
                 len(codes) AS n
          FROM body
        ),
        s2 AS (
          SELECT *, lead(v) OVER (PARTITION BY doc_id ORDER BY idx) AS nxt
          FROM s
        ),
        agg AS (
          SELECT doc_id,
                 MAX(n)::INT AS n_samples,
                 CAST(MAX(n) // {WAV_WINDOW} AS INT) AS n_windows,
                 CAST(SUM(CASE WHEN idx < (n // {WAV_WINDOW}) * {WAV_WINDOW}
                               THEN v * v ELSE 0 END) AS BIGINT) AS total_energy,
                 CAST(SUM(CASE WHEN nxt IS NOT NULL AND v * nxt < 0
                               THEN 1 ELSE 0 END) AS INT) AS zero_crossings
          FROM s2 GROUP BY doc_id
        )
        SELECT doc_id AS media_id, CAST({WAV_RATE} AS INT) AS sample_rate,
               n_samples, n_windows, total_energy, zero_crossings
        FROM agg
    """,
    # Real LOSSY codec restated from documents: a constant-c 8x8 block
    # decodes to the closed form
    #   dq  = floor(8*(c-128)/Q00 + 0.5)         (quantized DC)
    #   out = clamp(floor(dq*Q00/8 + 128.5), 0, 255)
    # with Q00 = 16 (Annex K luminance table [0,0]); every pixel of
    # the decoded image equals `out`, so mean_byte == out exactly.
    # Full video pipeline restated from documents: frame k (k = 0, 2
    # — every 2nd of 4) is a constant 8x8 JPEG of the (k+1)-th
    # ascii/'replace' char code ('?' = 63 past the end), so each
    # sampled frame decodes to the same constant-block closed form as
    # mm_jpeg_decode_stats and mean_pixel == out exactly.
    # Compressed-video pixel decode through the generic media path:
    # all VIDEO_FRAMES constant frames of a doc decode to out_v(c_k)
    # (same closed form as above), so mean_byte = avg over frames,
    # dim_b = pixels per decoded frame, n_bytes = total decoded
    # pixels.
    "mm_video_decode_stats": f"""
        WITH f AS (
          SELECT doc_id, k.range AS frame_no,
                 CASE WHEN length(COALESCE(text, '')) <= k.range THEN 63
                      WHEN unicode(substr(text, CAST(k.range + 1 AS INT), 1)) > 127 THEN 63
                      ELSE unicode(substr(text, CAST(k.range + 1 AS INT), 1))
                 END AS c
          FROM documents, range({VIDEO_FRAMES}) k
        ),
        decoded AS (
          SELECT doc_id, frame_no,
                 LEAST(255, GREATEST(0,
                   CAST(floor(
                     CAST(floor(8.0 * (c - 128) / 16 + 0.5) AS BIGINT) * 16 / 8.0
                     + 128.5) AS BIGINT))) AS out_v
          FROM f
        )
        SELECT doc_id AS media_id, 'video' AS media_type,
               CAST({VIDEO_FRAMES} AS INT) AS dim_a,
               CAST({VIDEO_SIDE * VIDEO_SIDE} AS INT) AS dim_b,
               CAST({VIDEO_FRAMES * VIDEO_SIDE * VIDEO_SIDE} AS INT) AS n_bytes,
               round(AVG(out_v * 1.0), 6) AS mean_byte
        FROM decoded GROUP BY doc_id
    """,
    "mm_video_frame_pixel_stats": f"""
        WITH f AS (
          SELECT doc_id, k.range AS frame_no,
                 CASE WHEN length(COALESCE(text, '')) <= k.range THEN 63
                      WHEN unicode(substr(text, CAST(k.range + 1 AS INT), 1)) > 127 THEN 63
                      ELSE unicode(substr(text, CAST(k.range + 1 AS INT), 1))
                 END AS c
          FROM documents, range({VIDEO_FRAMES}) k
          WHERE k.range % {VIDEO_EVERY_NTH} = 0
        ),
        decoded AS (
          SELECT doc_id, frame_no,
                 LEAST(255, GREATEST(0,
                   CAST(floor(
                     CAST(floor(8.0 * (c - 128) / 16 + 0.5) AS BIGINT) * 16 / 8.0
                     + 128.5) AS BIGINT))) AS out_v
          FROM f
        )
        SELECT doc_id AS media_id, CAST(frame_no AS INT) AS frame_no,
               CAST({VIDEO_SIDE} AS INT) AS width,
               CAST({VIDEO_SIDE} AS INT) AS height,
               round(out_v * 1.0, 6) AS mean_pixel
        FROM decoded
    """,
    "mm_jpeg_decode_stats": """
        WITH firstc AS (
          SELECT doc_id,
                 CASE WHEN length(COALESCE(text, '')) = 0 THEN 63
                      WHEN unicode(substr(text, 1, 1)) > 127 THEN 63
                      ELSE unicode(substr(text, 1, 1))
                 END AS c
          FROM documents
        ),
        decoded AS (
          SELECT doc_id,
                 LEAST(255, GREATEST(0,
                   CAST(floor(
                     CAST(floor(8.0 * (c - 128) / 16 + 0.5) AS BIGINT) * 16 / 8.0
                     + 128.5) AS BIGINT))) AS out_v
          FROM firstc
        )
        SELECT doc_id AS media_id, 'image' AS media_type,
               CAST(8 AS INT) AS dim_a, CAST(8 AS INT) AS dim_b,
               CAST(64 AS INT) AS n_bytes,
               round(out_v * 1.0, 6) AS mean_byte
        FROM decoded
    """,
    # Full real-codec resize chain restated from documents: 8x8 image
    # of the first 64 ascii/'replace' bytes padded with '?' (63);
    # out pixel (br, bc) = floor(sum of its 2x2 block / 4); stats of
    # the 4x4 result. Pure integer arithmetic end to end.
    "mm_png_resize_stats": """
        WITH chars AS (
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
        blocks AS (
          SELECT doc_id, (idx // 8) // 2 AS br, (idx % 8) // 2 AS bc,
                 CAST(floor(SUM(v) / 4.0) AS INT) AS out_v
          FROM px GROUP BY doc_id, br, bc
        )
        SELECT doc_id AS media_id, 'image' AS media_type,
               CAST(4 AS INT) AS dim_a, CAST(4 AS INT) AS dim_b,
               CAST(16 AS INT) AS n_bytes,
               round(SUM(out_v) / 16.0, 6) AS mean_byte
        FROM blocks GROUP BY doc_id
    """,
}


def media_stats(media: DataFrame) -> DataFrame:
    """Native (no-UDF) profile of a media table: sizes per type.
    Shows binary columns flow through ordinary Spark exprs."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )
