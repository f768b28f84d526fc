"""Baseline JPEG codec (operators/jpeg.py).

The mm_jpeg_decode_stats oracle covers constant blocks end to end;
these tests cover what a closed form can't: the Huffman/bit-stuffing
layer on arbitrary content (exact bitstream round-trip against the
direct numpy pipeline), boundary gray levels, odd dimensions,
quality on smooth content, and the unsupported-profile guards."""

import numpy as np
import pytest

from searchengine_spark.operators.jpeg import (
    QUANT_LUMA,
    _C,
    constant_block_decode_value,
    decode_jpeg,
    encode_jpeg,
)


def _direct_pipeline(img: np.ndarray) -> np.ndarray:
    """quantize->dequantize->IDCT computed without any bitstream —
    what a correct entropy-coding layer must reproduce exactly."""
    qf = QUANT_LUMA.astype(float)
    h, w = img.shape
    out = np.empty_like(img)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            b = img[by : by + 8, bx : bx + 8].astype(float) - 128.0
            qc = np.floor(np.round(_C @ b @ _C.T, 6) / qf + 0.5)
            blk = _C.T @ (qc * qf) @ _C
            out[by : by + 8, bx : bx + 8] = np.clip(
                np.floor(blk + 128.5), 0, 255
            )
    return out


def test_all_256_constant_blocks_match_closed_form():
    for c in range(256):
        w, h, out = decode_jpeg(encode_jpeg(np.full((8, 8), c, np.uint8)))
        assert (w, h) == (8, 8)
        assert np.all(out == constant_block_decode_value(c)), c


def test_bitstream_roundtrip_equals_direct_pipeline():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (40, 24)
    assert np.array_equal(out, _direct_pipeline(img))


def test_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (21, 13)
    assert out.shape == (13, 21)


def test_smooth_content_reconstruction_quality():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2


def test_unsupported_profiles_raise_cleanly():
    with pytest.raises(ValueError, match="magic"):
        decode_jpeg(b"not a jpeg")
    good = bytearray(encode_jpeg(np.full((8, 8), 100, np.uint8)))
    # flip SOF0 (0xC0) to progressive SOF2 (0xC2)
    i = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated


def test_decode_any_sniffs_jpeg():
    from searchengine_spark.operators.codecs import decode_any

    payload = encode_jpeg(np.full((8, 8), 200, np.uint8))
    got = decode_any(payload)
    assert got["media_type"] == "image"
    assert (got["dim_a"], got["dim_b"], got["n_bytes"]) == (8, 8, 64)
    assert got["mean_byte"] == float(constant_block_decode_value(200))


def test_encoder_rejects_non_greyscale():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 8), dtype=np.uint8))
