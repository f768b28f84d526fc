"""Stdlib PNG/WAV codec tests: spec round-trips, all five PNG filter
types (forward-filtered here, un-filtered by the decoder), malformed
input, and the Spark decode path over real payloads."""

import struct
import zlib

import numpy as np
import pytest

from searchengine_spark.operators.codecs import (
    PNG_MAGIC,
    decode_any,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)

rng = np.random.default_rng(7)


@pytest.mark.parametrize(
    "shape", [(1, 7), (5, 4), (16, 16), (3, 5, 3), (4, 4, 4)]
)
def test_png_roundtrip(shape):
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    w, h, c, out = decode_png(encode_png(px))
    assert (w, h) == (shape[1], shape[0])
    assert c == (1 if len(shape) == 2 else shape[2])
    expect = px if len(shape) == 3 else px[:, :, None]
    np.testing.assert_array_equal(out, expect)


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _forward_filter(raw: np.ndarray, ftypes: list[int], bpp: int) -> bytes:
    """Apply PNG filters (spec §6) so the decoder must reverse them."""
    h, stride = raw.shape
    out = b""
    for y in range(h):
        line = raw[y].astype(int)
        prev = raw[y - 1].astype(int) if y else np.zeros(stride, dtype=int)
        f = ftypes[y % len(ftypes)]
        filt = np.zeros(stride, dtype=int)
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                filt[x] = line[x]
            elif f == 1:
                filt[x] = line[x] - left
            elif f == 2:
                filt[x] = line[x] - up
            elif f == 3:
                filt[x] = line[x] - (left + up) // 2
            elif f == 4:
                filt[x] = line[x] - _paeth(left, up, ul)
        out += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
    return out


def _png_from_scanlines(w, h, color_type, scanlines: bytes) -> bytes:
    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels,color_type", [(1, 0), (3, 2), (4, 6)])
@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types_unfilter(channels, color_type, ftypes):
    h, w = 6, 5
    px = rng.integers(0, 256, size=(h, w * channels), dtype=np.uint8)
    data = _png_from_scanlines(
        w, h, color_type, _forward_filter(px, ftypes, bpp=channels)
    )
    gw, gh, gc, out = decode_png(data)
    assert (gw, gh, gc) == (w, h, channels)
    np.testing.assert_array_equal(out.reshape(h, w * channels), px)


def test_png_rejects_unsupported_and_malformed():
    with pytest.raises(ValueError):
        decode_png(b"notapng")
    # 16-bit depth is out of scope for the builtin decoder
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = PNG_MAGIC + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\0\0\0\0"
    with pytest.raises(ValueError):
        decode_png(bad)
    # truncated IDAT -> zlib error or length mismatch
    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(Exception):
        decode_png(good[:-20] + good[-12:])


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(channels):
    n = 480
    samples = rng.integers(-(1 << 15), 1 << 15, size=(n, channels), dtype=np.int16)
    if channels == 1:
        samples = samples[:, 0]
    rate, ch, frames, out = decode_wav(encode_wav(samples, sample_rate=8000))
    assert (rate, ch, frames) == (8000, channels, n)
    np.testing.assert_array_equal(out.reshape(-1), np.asarray(samples).reshape(-1))


def test_wav_tolerates_extra_chunks():
    base = encode_wav(np.array([1, -2, 3], dtype=np.int16))
    # splice a LIST metadata chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    rate, ch, frames, out = decode_wav(spliced)
    assert frames == 3 and list(out[:, 0]) == [1, -2, 3]


def test_decode_any_dispatch():
    img = decode_any(encode_png(np.full((2, 3), 100, dtype=np.uint8)))
    assert img["media_type"] == "image"
    assert (img["dim_a"], img["dim_b"], img["n_bytes"]) == (3, 2, 6)
    assert img["mean_byte"] == 100.0

    wav = decode_any(encode_wav(np.array([100, -100], dtype=np.int16), sample_rate=44100))
    assert wav["media_type"] == "audio"
    assert (wav["dim_a"], wav["dim_b"]) == (44100, 2)
    assert wav["mean_byte"] == 100.0

    assert decode_any(b"IM" + b"\0" * 20) is None  # fake format -> not real
    assert decode_any(None) is None


def test_decode_media_real_and_fake_mixed(spark):
    """One DataFrame mixing real PNG, real WAV, fake-header and junk
    payloads — decode_media routes each correctly."""
    from searchengine_spark.operators.multimodal import decode_media, encode_fake_media

    from searchengine_spark.operators.codecs import PNG_MAGIC

    good_png = encode_png(np.full((2, 2), 10, dtype=np.uint8))
    rows = [
        (1, "image", bytearray(good_png)),
        (2, "audio", bytearray(encode_wav(np.array([4, -4], dtype=np.int16), sample_rate=16000))),
        (3, "image", bytearray(encode_fake_media("image", 5, 7, b"abcd"))),
        (4, "image", bytearray(b"junk")),
        # poison blobs: valid magic, corrupt body — decode raises
        # zlib.error/struct.error internally; the row must become
        # zeros, never kill the task (the 100 TB contract)
        (5, "image", bytearray(PNG_MAGIC + b"\x00\x00\x00\x0dIHDR" + b"\xff" * 17)),
        (6, "image", bytearray(good_png[:30] + good_png[-12:])),
        (7, "audio", bytearray(b"RIFF\x10\x00\x00\x00WAVEfmt \x02\x00\x00\x00\x01\x00")),
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    got = {r.media_id: r for r in decode_media(df).collect()}
    assert (got[1].dim_a, got[1].dim_b, got[1].n_bytes, got[1].mean_byte) == (2, 2, 4, 10.0)
    assert (got[2].dim_a, got[2].dim_b, got[2].mean_byte) == (16000, 2, 4.0)
    assert (got[3].dim_a, got[3].dim_b, got[3].n_bytes) == (5, 7, 4)
    for bad in (4, 5, 6, 7):
        assert (got[bad].dim_a, got[bad].dim_b, got[bad].n_bytes) == (0, 0, 0), bad


def test_png_decode_stats_matches_oracle(spark, sf_dir):
    from searchengine_spark.operators.multimodal import ORACLES, q_png_decode_stats
    from tests.helpers import assert_matches_oracle

    assert_matches_oracle(
        q_png_decode_stats(spark, sf_dir),
        ORACLES["mm_png_decode_stats"],
        sf_dir,
        "mm_png_decode_stats",
    )


class TestAvi:
    def test_round_trip_demux(self):
        from searchengine_spark.operators.codecs import demux_avi, encode_avi

        frames = [b"jpeg-ish-frame-0", b"f1", b"\x00" * 31]
        out = demux_avi(encode_avi(frames, width=64, height=48, fps=24))
        assert out["frames"] == frames
        assert (out["width"], out["height"], out["n_frames"]) == (64, 48, 3)
        assert out["declared_frames"] == 3

    def test_demux_rejects_non_avi(self):
        import pytest

        from searchengine_spark.operators.codecs import demux_avi, encode_wav
        import numpy as np

        with pytest.raises(ValueError):
            demux_avi(b"RIFF\x00\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            demux_avi(encode_wav(np.zeros(8, dtype=np.int16)))

    def test_decode_any_reports_video_stats(self):
        from searchengine_spark.operators.codecs import decode_any, encode_avi

        frames = [bytes([10, 20]), bytes([30, 40, 50, 60])]
        got = decode_any(encode_avi(frames, width=8, height=8))
        assert got == {
            "media_type": "video",
            "dim_a": 2,       # n_frames
            "dim_b": 4,       # largest frame payload
            "n_bytes": 6,
            "mean_byte": 35.0,
        }

    def test_decode_any_pixel_decodes_mjpeg_frames(self):
        # MJPEG-in-AVI: decode_any must report DECODED-pixel stats
        # (not compressed-byte stats) when every frame is a baseline
        # JPEG — the constant-block closed form gives the expectation.
        import numpy as np

        from searchengine_spark.operators.codecs import decode_any, encode_avi
        from searchengine_spark.operators.jpeg import (
            constant_block_decode_value,
            encode_jpeg,
        )

        codes = [63, 100, 200]
        frames = [
            encode_jpeg(np.full((8, 8), c, dtype=np.uint8)) for c in codes
        ]
        got = decode_any(encode_avi(frames, width=8, height=8))
        want_mean = sum(constant_block_decode_value(c) for c in codes) / 3
        assert got == {
            "media_type": "video",
            "dim_a": 3,        # n_frames
            "dim_b": 64,       # decoded pixels per frame
            "n_bytes": 192,    # total decoded pixels
            "mean_byte": want_mean,
        }

    def test_decode_any_mixed_frames_fall_back_to_byte_stats(self):
        # One non-JPEG frame means the clip is NOT MJPEG — the branch
        # must fall back to opaque-byte stats, never half-decode.
        import numpy as np

        from searchengine_spark.operators.codecs import decode_any, encode_avi
        from searchengine_spark.operators.jpeg import encode_jpeg

        jpeg = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8))
        raw = bytes([1, 2, 3])
        got = decode_any(encode_avi([jpeg, raw], width=8, height=8))
        assert got["dim_a"] == 2
        assert got["n_bytes"] == len(jpeg) + 3
        assert got["dim_b"] == max(len(jpeg), 3)
