"""Pure-stdlib baseline JPEG codec (ITU-T T.81 sequential DCT).

Round-7 left JPEG as the one decode boundary excused by "needs PIL" —
but baseline JPEG needs no external codec: the entropy coder is plain
Huffman over (run, size) symbols, the transform is an 8x8 DCT (two
numpy matmuls, same machinery as the pHash), and the tables are
published in the standard's Annex K.  This module clears that boundary
the same way round 7 cleared PNG/WAV: an encoder twin plants fixtures
whose decoded values a DuckDB oracle can recompute from integer
formulas, so the bit reader, Huffman decode, dequantization, zigzag,
IDCT and level shift are all load-bearing for a driver value hash.

Scope (an honest baseline, not a full JPEG):

- SOF0 (baseline sequential DCT, 8-bit) only — progressive (SOF2),
  arithmetic coding, and hierarchical modes raise
  ``NotImplementedError``.
- grayscale (1 component) and YCbCr 4:4:4 / 4:2:0 (3 components,
  interleaved) — other sampling layouts raise.
- restart markers (DRI/RSTn) are honored by the decoder.

The JPEG 2-D DCT definition ``F(u,v) = 1/4 C(u)C(v) ΣΣ f(x,y)
cos(..) cos(..)`` factors exactly into the orthonormal form
``F = C8 @ f @ C8.T`` (the 1/4·C(u)C(v) constants equal the
orthonormal s(u)s(v)), so both directions are two 8x8 matmuls.

Quantized-coefficient rounding is ``floor(x/q + 0.5)`` for x >= 0 and
symmetric for x < 0 (round half away from zero) — pinned so the
planted-formula oracle can mirror it in SQL; the decoder's final
sample rounding is ``floor(x + 0.5)`` for the same reason.
"""

from __future__ import annotations

import struct

# --- Annex K tables (ITU-T T.81) -------------------------------------------

# K.1 — luminance quantization table, natural (row-major) order
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
# K.2 — chrominance quantization table
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# zigzag scan: ZIGZAG[k] = natural index of the k-th zigzag position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# K.3/K.4 — standard Huffman tables as (BITS counts per length 1..16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct8():
    """Orthonormal 8-point DCT-II matrix (cached)."""
    import numpy as np

    global _DCT8_CACHE
    try:
        return _DCT8_CACHE
    except NameError:
        pass
    n = 8
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    C = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    C[0] *= np.sqrt(1.0 / n)
    C[1:] *= np.sqrt(2.0 / n)
    _DCT8_CACHE = C
    return C


def _huff_code_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — small fixtures don't need a fast LUT."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _huff_code_table(bits, vals).items():
        out[(length, code)] = sym
    return out


def _quantize(x: float, q: int) -> int:
    """Round half away from zero — pinned for the formula oracle."""
    import math

    if x >= 0:
        return int(math.floor(x / q + 0.5))
    return -int(math.floor(-x / q + 0.5))


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-stuffing marker (the caller handles RST/EOI)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data exhausted at marker")
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF data byte
            else:
                self.marker = nxt
                raise ValueError("JPEG entropy data exhausted at marker")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RST handling); returns it."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None:
            m = self.marker
            self.marker = None
            return m
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("truncated JPEG: no marker found")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _csize(v: int) -> int:
    """Magnitude category (bit size) of a signed coefficient."""
    a = abs(v)
    n = 0
    while a:
        a >>= 1
        n += 1
    return n


# --- encoder ----------------------------------------------------------------


def _encode_block(
    coefs: list[int],
    prev_dc: int,
    w: _BitWriter,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one zigzag-ordered quantized block; returns DC."""
    dc = coefs[0]
    diff = dc - prev_dc
    size = _csize(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        mag = diff if diff >= 0 else diff + (1 << size) - 1
        w.write(mag, size)
    run = 0
    for k in range(1, 64):
        v = coefs[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zlen = ac_codes[0xF0]
            w.write(zrl, zlen)
            run -= 16
        size = _csize(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        mag = v if v >= 0 else v + (1 << size) - 1
        w.write(mag, size)
        run = 0
    if run:
        eob, elen = ac_codes[0x00]
        w.write(eob, elen)
    return dc


def _block_coefs(block, quant) -> list[int]:
    """8x8 spatial block → zigzag list of quantized DCT coefficients."""
    import numpy as np

    C = _dct8()
    F = C @ (block.astype(np.float64) - 128.0) @ C.T
    flat = F.reshape(-1)
    return [_quantize(float(flat[ZIGZAG[k]]), quant[ZIGZAG[k]]) for k in range(64)]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment() -> bytes:
    return _seg(
        0xDB,
        bytes([0]) + bytes(QUANT_LUMA[ZIGZAG[k]] for k in range(64))
        + bytes([1]) + bytes(QUANT_CHROMA[ZIGZAG[k]] for k in range(64)),
    )


def _dht_segment() -> bytes:
    payload = b""
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        payload += bytes([tc_th]) + bytes(bits) + bytes(vals)
    return _seg(0xC4, payload)


def encode_jpeg_gray(
    samples, width: int, height: int, restart_interval: int = 0
) -> bytes:
    """Baseline JPEG encoder, 8-bit grayscale — the fixture/test-side
    twin of :func:`decode_jpeg`.  ``samples`` is the row-major flat
    stream; edge blocks pad by edge replication (spec-recommended).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs
    (DC prediction resets), exercising the decoder's restart path."""
    import numpy as np

    img = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(height, width)
    bh = (height + 7) // 8
    bw = (width + 7) // 8
    padded = np.pad(img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge")
    dc_codes = _huff_code_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _huff_code_table(AC_LUMA_BITS, AC_LUMA_VALS)
    w = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev_dc = 0
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            prev_dc = _encode_block(
                _block_coefs(block, QUANT_LUMA), prev_dc, w, dc_codes, ac_codes
            )
            mcu += 1
    w.flush()
    sof = _seg(
        0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8" + _dqt_segment() + sof + _dht_segment() + dri + sos
        + bytes(w.out) + b"\xff\xd9"
    )


def _rgb_to_ycbcr(rgb):
    """JFIF color transform (float, then clamped uint8)."""
    import numpy as np

    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def encode_jpeg_rgb(samples, width: int, height: int, subsample: bool = False) -> bytes:
    """Baseline JPEG encoder, RGB in / YCbCr 4:4:4 (or 4:2:0 when
    ``subsample``) out, interleaved single scan."""
    import numpy as np

    rgb = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(rgb)
    hs = vs = 2 if subsample else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mw = (width + mcu_w - 1) // mcu_w
    mh = (height + mcu_h - 1) // mcu_h
    pads = ((0, mh * mcu_h - height), (0, mw * mcu_w - width))
    y = np.pad(ycc[:, :, 0], pads, mode="edge")
    cb = np.pad(ycc[:, :, 1], pads, mode="edge")
    cr = np.pad(ycc[:, :, 2], pads, mode="edge")
    if subsample:
        # 2x2 mean, floor(x+0.5) — the common box-filter downsample
        def down(c):
            c = c.astype(np.float64)
            m = (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]) / 4.0
            return np.floor(m + 0.5).astype(np.uint8)

        cb, cr = down(cb), down(cr)
    dc_l = _huff_code_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_code_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_code_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_code_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    w = _BitWriter()
    prev = [0, 0, 0]
    for my in range(mh):
        for mx in range(mw):
            for sy in range(vs):
                for sx in range(hs):
                    by, bx = my * vs + sy, mx * hs + sx
                    block = y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    prev[0] = _encode_block(
                        _block_coefs(block, QUANT_LUMA), prev[0], w, dc_l, ac_l
                    )
            for ci, comp in ((1, cb), (2, cr)):
                block = comp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                prev[ci] = _encode_block(
                    _block_coefs(block, QUANT_CHROMA), prev[ci], w, dc_c, ac_c
                )
    w.flush()
    samp = 0x22 if subsample else 0x11
    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8" + _dqt_segment() + sof + _dht_segment() + sos
        + bytes(w.out) + b"\xff\xd9"
    )


# --- decoder ----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG decoder → ``(width, height, channels, samples)``
    with ``samples`` the row-major flat 8-bit stream (grayscale or
    RGB, matching :func:`..multimodal.decode_png`'s contract).

    Sequential DCT (SOF0), Huffman entropy coding, grayscale or YCbCr
    with uniform or 2x2-luma (4:2:0) sampling, restart markers.
    Progressive/arithmetic/12-bit modes raise ``NotImplementedError``
    (an honest boundary); corrupt structure raises ``ValueError``.
    """
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (height, width, [(cid, h, v, tq)])
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if pos + 2 + ln > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = list(body[i + 1 : i + 65])
                if len(zz) < 64:
                    raise ValueError("truncated JPEG DQT")
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                quant[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated JPEG DHT")
                table = _huff_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w_, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential (SOF0) "
                "is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(
                np, payload, pos + 2 + ln, frame, scan, quant,
                huff_dc, huff_ac, restart_interval,
            )
        elif marker == 0xD9:
            raise ValueError("JPEG EOI before SOS")
        pos += 2 + ln
    raise ValueError("truncated JPEG: no SOS marker")


def _decode_scan(np, payload, pos, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    height, width, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mw = (width + mcu_w - 1) // mcu_w
    mh = (height + mcu_h - 1) // mcu_h
    C = _dct8()
    planes = {}
    for cid, h, v, tq in comps:
        planes[cid] = np.zeros((mh * v * 8, mw * h * 8), dtype=np.float64)
    reader = _BitReader(payload, pos)
    prev_dc = {cid: 0 for cid, _, _, _ in comps}
    mcu_count = 0
    for my in range(mh):
        for mx in range(mw):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("JPEG expected RST marker")
                prev_dc = {cid: 0 for cid, _, _, _ in comps}
            for cs, td, ta in scan:
                h, v, tq = by_id[cs]
                q = quant[tq]
                for sy in range(v):
                    for sx in range(h):
                        coefs = np.zeros(64, dtype=np.float64)
                        sym = reader.decode_symbol(huff_dc[td])
                        diff = _extend(reader.read_bits(sym), sym)
                        prev_dc[cs] += diff
                        coefs[0] = prev_dc[cs] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coefs[ZIGZAG[k]] = (
                                _extend(reader.read_bits(s), s) * q[ZIGZAG[k]]
                            )
                            k += 1
                        block = C.T @ coefs.reshape(8, 8) @ C + 128.0
                        py, px = (my * v + sy) * 8, (mx * h + sx) * 8
                        planes[cs][py : py + 8, px : px + 8] = block
            mcu_count += 1
    # upsample subsampled planes to full MCU-grid resolution, crop
    full = {}
    for cid, h, v, tq in comps:
        p = planes[cid]
        if h != hmax or v != vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full[cid] = p[:height, :width]
    clip = lambda a: np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)  # noqa: E731
    if len(comps) == 1:
        return width, height, 1, clip(full[comps[0][0]]).tobytes()
    if len(comps) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    y = full[comps[0][0]]
    cb = full[comps[1][0]] - 128.0
    cr = full[comps[2][0]] - 128.0
    r = clip(y + 1.402 * cr)
    g = clip(y - 0.344136286 * cb - 0.714136286 * cr)
    b = clip(y + 1.772 * cb)
    return width, height, 3, np.stack([r, g, b], axis=2).tobytes()
