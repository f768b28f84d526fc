"""Optional-pyav video decode (round-11 verdict item 6).

pyav is NOT installed in the build container; the contract tested
unconditionally here is that its absence leaves the stdlib decode
chain byte-identical to before (non-MJPEG AVI -> opaque byte stats,
MP4/MKV -> None -> fake-header/skip fallback). The pyav-marked test
runs wherever pyav IS installed and proves the same mapInPandas
dataflow decodes H.264 pixels with the MJPEG-path semantics.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from searchengine_spark.operators.codecs import (
    decode_any,
    decode_with_pyav,
    encode_avi,
)

try:
    import av  # noqa: F401

    HAVE_PYAV = True
except ImportError:
    HAVE_PYAV = False


def _non_mjpeg_avi() -> bytes:
    # Structurally valid AVI whose frames are NOT JPEGs (no FFD8FF
    # magic) — stands in for an H.264-in-AVI clip the stdlib chain
    # cannot pixel-decode.
    frames = [bytes([i]) * 64 for i in range(1, 4)]
    return encode_avi(frames, width=8, height=8)


@pytest.mark.skipif(HAVE_PYAV, reason="pyav installed — absence path n/a")
def test_pyav_absent_keeps_stdlib_fallback():
    payload = _non_mjpeg_avi()
    assert decode_with_pyav(payload) is None
    # stdlib fallback unchanged: opaque byte stats, typed video row
    out = decode_any(payload)
    assert out is not None and out["media_type"] == "video"
    assert out["dim_a"] == 3  # n_frames from the AVI header
    assert out["n_bytes"] == 3 * 64
    exp_mean = float(np.mean([1] * 64 + [2] * 64 + [3] * 64))
    assert abs(out["mean_byte"] - exp_mean) < 1e-9


@pytest.mark.skipif(HAVE_PYAV, reason="pyav installed — absence path n/a")
def test_mp4_unrecognized_without_pyav():
    fake_mp4 = struct.pack(">I", 20) + b"ftypisom" + b"\x00" * 64
    assert decode_any(fake_mp4) is None


@pytest.mark.skipif(not HAVE_PYAV, reason="pyav not installed")
def test_h264_pixel_decode_with_pyav(spark):
    """Runs only where pyav is installed: encode a tiny H.264 clip
    with pyav itself, then prove decode_any yields MJPEG-semantics
    pixel stats and the mapInPandas decode dataflow carries it."""
    import io

    buf = io.BytesIO()
    n_frames, w, h = 4, 32, 24
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("h264", rate=4)
        stream.width, stream.height = w, h
        stream.pix_fmt = "yuv420p"
        for i in range(n_frames):
            arr = np.full((h, w, 3), 32 * (i + 1), dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    payload = buf.getvalue()

    out = decode_any(payload)
    assert out is not None and out["media_type"] == "video"
    assert out["dim_a"] == n_frames
    assert out["dim_b"] == w * h  # gray plane px per frame
    assert out["n_bytes"] == n_frames * w * h
    assert 0.0 < out["mean_byte"] < 255.0

    # same mapInPandas dataflow as the registry queries
    from searchengine_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, "video", bytearray(payload))],
        "media_id bigint, media_type string, payload binary",
    )
    row = decode_media(df).collect()[0]
    assert row.dim_a == n_frames and row.n_bytes == n_frames * w * h
