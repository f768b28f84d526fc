"""Real media codecs, stdlib-only: PNG (RFC 2083 / ISO 15948) and
WAV (RIFF); baseline JPEG lives in operators/jpeg.py and is sniffed
here too. No imaging library ships in this container, so the
decoders are implemented directly against the published formats —
zlib + struct + numpy — which is all PNG needs (DEFLATE streams,
per-scanline filters) and more than WAV needs (PCM in a RIFF
container).

These are the swap-in kernels for operators/multimodal.py's
mapInPandas stages: `decode_any` sniffs magic bytes and returns
typed metadata + a content feature for real payloads. Pillow, when
importable, is preferred for PNG (and adds JPEG support); otherwise
the built-in decoder handles 8-bit greyscale/RGB/RGBA PNGs — the
shapes a training-data pipeline emits — and raises a clear error on
exotic ones (16-bit, interlaced, palette).

Scale note: decoding runs inside Arrow-batched mapInPandas only.
Per item it is O(n_bytes); numpy vectorizes the un-filtering inner
loop across each scanline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in the build container
    from PIL import Image as _PILImage
    import io as _io

    _PIL_AVAILABLE = True
except Exception:
    _PIL_AVAILABLE = False

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
RIFF_MAGIC = b"RIFF"

# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit greyscale (H,W) or RGB/RGBA (H,W,C),
    filter 0 on every scanline, one IDAT chunk."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        channels = arr.shape[2]
        color_type = 2 if channels == 3 else 6
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, w * channels)
    scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int, channels: int) -> np.ndarray:
    """Reverse the five PNG scanline filters (spec §6)."""
    stride = w * channels
    bpp = channels  # bytes per pixel at bit depth 8
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                line[x] = (int(line[x]) + (int(line[x - bpp]) if x >= bpp else 0)) & 0xFF
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256, as the spec demands
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
            out[y] = line
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.reshape((h, w, channels))


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG bytes -> (width, height, channels, uint8 pixels (H,W,C)).

    Supports bit depth 8, color types 0/2/4/6, non-interlaced —
    everything encode_png (or Pillow's default writer for these
    modes) produces. Raises ValueError on malformed or unsupported
    input; the mapInPandas stages catch that per item so one bad blob
    never kills a 100 TB job.
    """
    if _PIL_AVAILABLE:  # pragma: no cover
        img = _PILImage.open(_io.BytesIO(data))
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return (img.width, img.height, arr.shape[2], arr)
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad magic)")
    pos, w = len(PNG_MAGIC), 0
    h = depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + payload + crc
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if h is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or color_type not in _PNG_CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color_type} "
            f"interlace={interlace}); built-in decoder handles 8-bit "
            "grey/RGB/RGBA non-interlaced"
        )
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = h * (1 + w * channels)
    if len(raw) != expected:
        raise ValueError(f"PNG data length {len(raw)} != expected {expected}")
    return (w, h, channels, _unfilter(raw, w, h, channels))


def encode_wav(samples: np.ndarray, *, sample_rate: int = 16000) -> bytes:
    """Minimal PCM16 mono/stereo WAV writer."""
    arr = np.asarray(samples, dtype=np.int16)
    n_channels = 1 if arr.ndim == 1 else arr.shape[1]
    frames = arr.reshape(-1, n_channels)
    body = frames.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, n_frames, int16 frames).

    Walks RIFF chunks directly (PCM16 only) — the container format is
    trivial and chunk-walking tolerates extra metadata chunks (LIST,
    fact) that the stdlib `wave` module also skips.
    """
    if not (data[:4] == RIFF_MAGIC and data[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = n_channels = bits = None
    body = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            _fmt, n_channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
        elif tag == b"data":
            body = payload
    if body is None or sample_rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits}; PCM16 only")
    frames = np.frombuffer(body, dtype="<i2").reshape(-1, n_channels)
    return (sample_rate, n_channels, frames.shape[0], frames)


def decode_with_pyav(payload: bytes) -> dict | None:
    """Optional FFmpeg-backed pixel decode (pyav) for video codecs the
    stdlib chain doesn't cover — H.264 and friends, in AVI/MP4/MKV
    containers. Import-guarded: returns None when pyav is absent or
    the payload doesn't decode, so the stdlib path is untouched
    wherever pyav isn't installed (this container, by default). The
    returned dict has the exact MJPEG-path semantics: dim_a=n_frames,
    dim_b=decoded px per frame, n_bytes=total decoded px, mean_byte=
    mean decoded luma — so mm_video_frame_pixel_stats is codec-
    agnostic when pyav is present (tests/test_pyav_video.py)."""
    try:
        import av  # noqa: F401 — optional, never in requirements
    except ImportError:
        return None
    import io

    try:
        with av.open(io.BytesIO(bytes(payload))) as container:
            stream = next(
                (s for s in container.streams if s.type == "video"), None
            )
            if stream is None:
                return None
            n_frames = 0
            per_frame = 0
            n_px = 0
            px_sum = 0.0
            for frame in container.decode(stream):
                arr = frame.to_ndarray(format="gray")
                n_frames += 1
                per_frame = per_frame or int(arr.size)
                n_px += int(arr.size)
                px_sum += float(arr.sum())
    except Exception:  # noqa: BLE001 — undecodable: let callers fall back
        return None
    if n_frames == 0:
        return None
    return {
        "media_type": "video",
        "dim_a": n_frames,
        "dim_b": per_frame,
        "n_bytes": n_px,
        "mean_byte": px_sum / n_px if n_px else 0.0,
    }


# Container magics pyav can demux that the stdlib chain cannot decode.
_ISO_BMFF_TAG = b"ftyp"  # MP4/MOV: size(4) + 'ftyp' at offset 4
_MATROSKA_MAGIC = b"\x1a\x45\xdf\xa3"  # MKV/WebM EBML header


def decode_any(payload: bytes) -> dict | None:
    """Sniff + decode a real media payload into the DECODED_SCHEMA
    field dict, or None when the format is unrecognized (callers fall
    back to the fake-header stub or skip the row)."""
    if payload is None or len(payload) < 12:
        return None
    if payload.startswith(b"\xff\xd8\xff"):
        from searchengine_spark.operators.jpeg import decode_jpeg

        w, h, px = decode_jpeg(bytes(payload))
        return {
            "media_type": "image",
            "dim_a": w,
            "dim_b": h,
            "n_bytes": int(px.size),
            "mean_byte": float(px.mean()) if px.size else 0.0,
        }
    if payload.startswith(PNG_MAGIC):
        w, h, c, px = decode_png(payload)
        return {
            "media_type": "image",
            "dim_a": w,
            "dim_b": h,
            "n_bytes": int(px.size),
            "mean_byte": float(px.mean()) if px.size else 0.0,
        }
    if payload[:4] == RIFF_MAGIC and payload[8:12] == b"WAVE":
        rate, ch, n, frames = decode_wav(payload)
        return {
            "media_type": "audio",
            "dim_a": rate,
            "dim_b": n,
            "n_bytes": int(frames.size * 2),
            "mean_byte": float(np.abs(frames.astype(np.int32)).mean()) if n else 0.0,
        }
    if payload[:4] == RIFF_MAGIC and payload[8:12] == b"AVI ":
        out = demux_avi(payload)
        frames = out["frames"]
        # Compressed-video PIXEL decode (round-10 verdict item 5):
        # when every frame is a baseline JPEG (MJPEG-in-AVI — the
        # container's own stream tag), decode each frame through the
        # stdlib JPEG path and report DECODED-pixel stats; any other
        # codec (H.264 etc.) falls back to opaque-byte stats below,
        # so a clip this build can't decode still yields typed rows
        # instead of killing the job.
        if frames and all(f[:3] == b"\xff\xd8\xff" for f in frames):
            try:
                from searchengine_spark.operators.jpeg import decode_jpeg

                pix = [decode_jpeg(bytes(f))[2] for f in frames]
                n_px = sum(int(p.size) for p in pix)
                return {
                    "media_type": "video",
                    "dim_a": out["n_frames"],
                    "dim_b": int(pix[0].size),  # decoded px per frame
                    "n_bytes": n_px,
                    "mean_byte": float(
                        sum(float(p.sum()) for p in pix) / n_px
                    )
                    if n_px
                    else 0.0,
                }
            except Exception:  # noqa: BLE001 — corrupt frame: byte stats
                pass
        # Non-MJPEG frames (H.264-in-AVI etc.): optional pyav pixel
        # decode before the opaque-byte fallback.
        via_av = decode_with_pyav(payload)
        if via_av is not None:
            return via_av
        total = sum(len(f) for f in frames)
        all_bytes = b"".join(frames)
        return {
            "media_type": "video",
            "dim_a": out["n_frames"],
            "dim_b": max((len(f) for f in frames), default=0),
            "n_bytes": total,
            "mean_byte": float(np.frombuffer(all_bytes, dtype=np.uint8).mean())
            if total
            else 0.0,
        }
    # MP4/MOV/MKV containers: nothing in the stdlib chain can demux
    # them — pyav (when installed) is the only path to pixels.
    if payload[4:8] == _ISO_BMFF_TAG or payload[:4] == _MATROSKA_MAGIC:
        return decode_with_pyav(payload)
    return None


# ----------------------------------------------------------------- AVI
# AVI is a RIFF form (Microsoft "AVI RIFF File Reference"): a 'hdrl'
# LIST with the main header ('avih') and one stream LIST per stream,
# then a 'movi' LIST whose '##dc'/'##db' chunks carry the encoded
# frames, then an optional 'idx1' index. Demuxing — walking the
# container and handing back per-frame byte payloads — needs only
# struct; FRAME PIXEL decode would need a video codec (pyav), which
# frame-sampling pipelines don't require.


def encode_avi(
    frames: list[bytes], *, width: int = 16, height: int = 16, fps: int = 30
) -> bytes:
    """Minimal spec-conformant single-video-stream AVI writer
    (MJPG-tagged frame chunks, idx1 index). The frame payloads are
    opaque bytes — real JPEGs or test vectors alike."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""  # word alignment
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(four_cc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four_cc + payload)

    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        len(frames),               # dwTotalFrames
        0, 1,                      # dwInitialFrames, dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,                # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks, idx, offset = [], [], 4  # offsets are relative to 'movi'
    for f in frames:
        movi_chunks.append(chunk(b"00dc", f))
        idx.append(b"00dc" + struct.pack("<3I", 0x10, offset, len(f)))
        offset += 8 + len(f) + (len(f) & 1)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_avi(data: bytes) -> dict:
    """AVI bytes -> {width, height, n_frames, frames: [bytes, ...]}.

    Chunk-walks the RIFF tree; collects every video frame chunk
    ('##dc' compressed / '##db' uncompressed) from the 'movi' LIST in
    stream order. Tolerates missing idx1 and unknown chunks (skipped
    by length, like the WAV walker)."""
    if not (data[:4] == RIFF_MAGIC and data[8:12] == b"AVI "):
        raise ValueError("not a RIFF/AVI file")
    width = height = declared = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, declared
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (length,) = struct.unpack_from("<I", buf, pos + 4)
            start = pos + 8
            stop = min(start + length, end)
            if tag == b"LIST":
                four_cc = buf[start : start + 4]
                walk(buf, start + 4, stop, in_movi or four_cc == b"movi")
            elif tag == b"avih":
                (_, _, _, _, declared, _, _, _, width, height) = struct.unpack_from(
                    "<10I", buf, start
                )
            elif (
                in_movi
                and len(tag) == 4
                and tag[:2].isdigit()
                and tag[2:4] in (b"dc", b"db")
            ):
                frames.append(bytes(buf[start:stop]))
            pos = start + length + (length & 1)

    walk(data, 12, len(data), False)
    if width is None:
        raise ValueError("AVI missing avih header")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "declared_frames": declared,
        "frames": frames,
    }
