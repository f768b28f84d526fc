"""Baseline JPEG codec (ITU-T T.81 / ISO 10918-1), pure numpy.

No imaging library ships in this container, so — like the PNG/WAV/AVI
codecs in operators/codecs.py — the format is implemented directly
against the published standard: the encoder and decoder here cover
BASELINE SEQUENTIAL, 8-bit, single-component (greyscale) JPEG with
the Annex K luminance quantization + Huffman tables. That is the
profile a training-data thumbnail/feature pipeline needs; explicitly
unsupported (clear ValueError, never a wrong answer): progressive
scans, chroma subsampling / multi-component scans, 12-bit precision,
arithmetic coding, restart markers.

Everything numeric is pinned so decode is bit-deterministic:

- DCT/IDCT are matmuls against the precomputed orthonormal 8x8 DCT-II
  basis in float64 (JPEG's normalization: a constant block v has
  DC = 8v and zero AC).
- Quantization rounds with floor(x/q + 0.5) (round-half-up toward
  +inf) — the same engine-portable rounding used by
  operators/quantization.py, and mirrorable 1:1 in oracle SQL.
- Final pixel reconstruction is clamp(floor(idct + 128 + 0.5), 0, 255).

For a CONSTANT block (every pixel = c) the whole lossy pipeline
collapses to a scalar formula — quantized DC = floor(8(c-128)/Q00 +
0.5), decoded pixel = clamp(floor(Dq*Q00/8 + 128.5), 0, 255) — which
is what lets operators/multimodal.py state a DuckDB oracle for the
real JPEG path (mm_jpeg_decode_stats). Non-constant content is
covered by tests/test_jpeg.py: the bitstream round-trip must
reproduce exactly the quantize->dequantize->IDCT image computed
directly in numpy, which exercises the Huffman/bit-stuffing layer —
the part a formula can't reach.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# Annex K.1 luminance quantization table (quality 50), zigzag order
# flattened row-major here (natural order).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.3.1 / K.3.2: standard luminance Huffman specs
# (BITS list: #codes of length 1..16, then the symbol values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Zigzag scan order: ZIGZAG[i] = natural (row*8+col) index of the
# i-th zigzag coefficient.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: F = C f C^T, f = C^T F C."""
    x = np.arange(8)
    u = x.reshape(-1, 1)
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0, :] *= np.sqrt(1 / 2)
    return c / 2.0


_C = _dct_basis()


def _build_huffman(bits: list[int], vals: list[int]) -> dict[int, str]:
    """symbol -> canonical code string (JPEG Annex C code assignment)."""
    codes: dict[int, str] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = format(code, f"0{length}b")
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
_AC_CODES = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)


def _magnitude_category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, s: int) -> str:
    """JPEG magnitude encoding: positives as-is, negatives as
    v + 2^s - 1 (one's complement of |v|)."""
    if s == 0:
        return ""
    if v < 0:
        v = v + (1 << s) - 1
    return format(v, f"0{s}b")


class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[str] = []

    def write(self, bits: str) -> None:
        self._bits.append(bits)

    def tobytes(self) -> bytes:
        s = "".join(self._bits)
        s += "1" * (-len(s) % 8)  # pad with 1s per spec
        raw = int(s, 2).to_bytes(len(s) // 8, "big") if s else b""
        return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing


def _quantize_block(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """float DCT coefficients -> quantized ints, floor(x/q + 0.5).

    Coefficients are snapped to 6 decimals first: the DCT matmul
    carries ~1e-13 noise, and integer images routinely put x/q
    EXACTLY on the .5 rounding boundary (a constant block's DC is
    8(c-128), half-integer over q00=16 for every odd c) — without the
    snap, which side of floor() the noise lands on is arbitrary.
    After it, boundary cases quantize identically everywhere, which
    is what makes the constant-block closed form (and its SQL oracle)
    exact."""
    return np.floor(np.round(block, 6) / q + 0.5).astype(np.int64)


def encode_jpeg(pixels: np.ndarray, *, quant: np.ndarray = QUANT_LUMA) -> bytes:
    """8-bit greyscale (H, W) -> baseline JFIF bytes.

    Dimensions need not be multiples of 8: edge pixels are replicated
    to fill partial blocks (the standard convention; the decoder
    crops back to the SOF dimensions).
    """
    if pixels.ndim != 2:
        raise ValueError("encode_jpeg supports greyscale (H, W) only")
    h, w = pixels.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = -h % 8, -w % 8
    padded = np.pad(pixels, ((0, ph), (0, pw)), mode="edge").astype(np.float64)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT: Pq=0 (8-bit), Tq=0, zigzag order
    zz_q = quant.flatten()[ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q.tobytes()
    # SOF0: baseline, 8-bit, 1 component, no subsampling
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])  # id=1, h1v1, quant table 0
    # DHT: DC then AC luminance
    for cls, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([cls])
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    writer = _BitWriter()
    prev_dc = 0
    qf = quant.astype(np.float64)
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coeffs = _quantize_block(_C @ block @ _C.T, qf)
            zz = coeffs.flatten()[ZIGZAG]
            # DC
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s = _magnitude_category(diff)
            writer.write(_DC_CODES[s] + _magnitude_bits(diff, s))
            # AC with run-lengths
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, 64):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    writer.write(_AC_CODES[0xF0])  # ZRL
                    run -= 16
                s = _magnitude_category(v)
                writer.write(_AC_CODES[run * 16 + s] + _magnitude_bits(v, s))
                run = 0
            if last_nz < 63:
                writer.write(_AC_CODES[0x00])  # EOB

    out += writer.tobytes()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00
    de-stuffing already applied."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self._pos >> 3
        if byte >= len(self._data):
            raise ValueError("truncated entropy-coded segment")
        bit = (self._data[byte] >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: map s magnitude bits back to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline greyscale JPEG bytes -> (width, height, uint8 (H, W)).

    Raises ValueError on malformed input or on profiles outside the
    supported baseline-greyscale subset (see module docstring)."""
    if not data.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG (bad magic)")
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, struct.error) as exc:
        # out-of-range reads on truncated/corrupt segments surface as
        # the same clean error contract the other codecs use
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode_jpeg_inner(data: bytes) -> tuple[int, int, np.ndarray]:
    pos = 2
    quant_tables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    dc_id = ac_id = 0
    sof_tq = 0
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                quant_tables[tq] = nat.reshape(8, 8)
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC0:  # SOF0
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (greyscale) supported")
            if seg[7] != 0x11:
                raise ValueError("subsampling unsupported")
            sof_tq = seg[8]
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart markers unsupported")
        elif marker == 0xDA:  # SOS
            if seg[0] != 1:
                raise ValueError("multi-component scan unsupported")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0x0F
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if scan_start is None or h is None:
        raise ValueError("missing SOS/SOF0")
    q = quant_tables.get(sof_tq)
    if q is None:
        raise ValueError("quant table referenced but not defined")
    dc_table = huff.get((0, dc_id))
    ac_table = huff.get((1, ac_id))
    if dc_table is None or ac_table is None:
        raise ValueError("Huffman table referenced but not defined")

    # entropy segment runs to EOI; de-stuff 0xFF00 -> 0xFF
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    reader = _BitReader(data[scan_start:end].replace(b"\xff\x00", b"\xff"))

    bh, bw = (h + 7) // 8, (w + 7) // 8
    out = np.empty((bh * 8, bw * 8), dtype=np.uint8)
    prev_dc = 0
    qf = q.astype(np.float64)
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int64)
            s = _read_symbol(reader, dc_table)
            prev_dc += _extend(reader.read_bits(s), s)
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = _read_symbol(reader, ac_table)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC symbol")
                    i += 16  # ZRL
                    continue
                i += run
                if i >= 64:
                    raise ValueError("AC index overflow")
                zz[i] = _extend(reader.read_bits(size), size)
                i += 1
            nat = np.empty(64, dtype=np.int64)
            nat[ZIGZAG] = zz
            coeffs = nat.reshape(8, 8).astype(np.float64) * qf
            block = _C.T @ coeffs @ _C
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.floor(block + 128.5), 0, 255
            ).astype(np.uint8)
    return w, h, out[:h, :w]


def constant_block_decode_value(c: int, *, q00: int = int(QUANT_LUMA[0, 0])) -> int:
    """The closed-form decode of a constant-c 8x8 block — the scalar
    the DuckDB oracle restates: quantized DC = floor(8(c-128)/q00 +
    0.5); decoded pixel = clamp(floor(Dq*q00/8 + 128.5), 0, 255)."""
    dq = int(np.floor(8.0 * (c - 128) / q00 + 0.5))
    return int(np.clip(np.floor(dq * q00 / 8.0 + 128.5), 0, 255))
