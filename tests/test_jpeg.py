"""Baseline JPEG codec tests (operators/jpeg.py, round 8).

The encoder is the fixture-side twin; the decoder is the production
path inside decode_media.  No external JPEG library exists in this
container, so correctness rests on (a) exact integer formulas for
DC-only (block-constant) images, (b) lossy round-trip error bounds
that only hold if every stage (Huffman, dequant, zigzag, IDCT, color
transform) is right — a mis-decoded bitstream produces garbage, not
small errors — and (c) structural invariants (RST markers must not
change output; 4:2:0 luma equals 4:4:4 luma on gray-valued input).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcm_problem_f_data_wrangling_spark.operators.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    _quantize,
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_rgb,
)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == list(range(64))
    # spec spot checks (T.81 figure 5): first and last few entries
    assert ZIGZAG[:6] == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-3:] == [55, 62, 63]


def test_quantize_rounds_half_away_from_zero():
    assert _quantize(24.0, 16) == 2  # 1.5 -> 2
    assert _quantize(-24.0, 16) == -2
    assert _quantize(23.9, 16) == 1
    assert _quantize(-23.9, 16) == -1


def test_block_constant_gray_decodes_to_exact_formula():
    """DC-only blocks: decoded value is 128 + 2k for planted 128 + 2k
    (Annex-K q00=16) — the law the x_multimodal_jpeg oracle pins."""
    w, h = 16, 24
    img = np.zeros((h, w), dtype=np.uint8)
    ks = {}
    for bi in range(3):
        for bj in range(2):
            k = (17 * bi + 29 * bj + 5) % 48
            ks[(bi, bj)] = k
            img[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = 128 + 2 * k
    w2, h2, ch, flat = decode_jpeg(encode_jpeg_gray(img.tobytes(), w, h))
    assert (w2, h2, ch) == (w, h, 1)
    dec = np.frombuffer(flat, np.uint8).reshape(h, w)
    for (bi, bj), k in ks.items():
        assert (dec[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] == 128 + 2 * k).all()


def test_smooth_gray_roundtrip_tight():
    """Blockwise-flat content survives with error <= 1 — any Huffman /
    zigzag / IDCT slip produces garbage, not off-by-one."""
    rs = np.random.RandomState(11)
    img = np.kron(rs.randint(40, 220, size=(5, 7)).astype(np.uint8), np.ones((8, 8), np.uint8))
    _, _, _, flat = decode_jpeg(encode_jpeg_gray(img.tobytes(), 56, 40))
    dec = np.frombuffer(flat, np.uint8).reshape(40, 56)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_noise_gray_roundtrip_bounded():
    """Random noise is JPEG's worst case; the quantization-error bound
    still holds (sum over 64 coefs of q/2 per basis magnitude) —
    use a generous envelope that a real decode always meets and a
    broken one never does."""
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, size=(40, 56)).astype(np.uint8)
    _, _, _, flat = decode_jpeg(encode_jpeg_gray(img.tobytes(), 56, 40))
    dec = np.frombuffer(flat, np.uint8).reshape(40, 56)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 30 and err.max() < 130


def test_restart_markers_do_not_change_output():
    rs = np.random.RandomState(3)
    img = np.kron(rs.randint(40, 220, size=(6, 5)).astype(np.uint8), np.ones((8, 8), np.uint8))
    plain = decode_jpeg(encode_jpeg_gray(img.tobytes(), 40, 48))
    for interval in (1, 2, 4, 7):
        assert decode_jpeg(encode_jpeg_gray(img.tobytes(), 40, 48, interval)) == plain


def test_rgb_444_roundtrip_and_odd_size_crop():
    rs = np.random.RandomState(5)
    img = np.kron(
        rs.randint(40, 220, size=(3, 2, 3)).astype(np.uint8), np.ones((8, 8, 1), np.uint8)
    )
    w2, h2, ch, flat = decode_jpeg(encode_jpeg_rgb(img.tobytes(), 16, 24))
    assert (w2, h2, ch) == (16, 24, 3)
    dec = np.frombuffer(flat, np.uint8).reshape(24, 16, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
    # odd geometry: pad-encode then crop-decode back to exact dims
    odd = img[:13, :11]
    w2, h2, ch, flat = decode_jpeg(encode_jpeg_rgb(odd.tobytes(), 11, 13))
    assert (w2, h2, ch) == (11, 13, 3)


def test_rgb_420_gray_valued_luma_matches_444():
    """Gray-valued input has constant-128 chroma, so 4:2:0 subsampling
    is lossless there and the decoded image equals the 4:4:4 decode."""
    rs = np.random.RandomState(9)
    gray = np.kron(rs.randint(40, 220, size=(4, 4)).astype(np.uint8), np.ones((8, 8), np.uint8))
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    d444 = decode_jpeg(encode_jpeg_rgb(rgb.tobytes(), 32, 32, subsample=False))
    d420 = decode_jpeg(encode_jpeg_rgb(rgb.tobytes(), 32, 32, subsample=True))
    assert d444 == d420


def test_error_paths():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x04\x08\x00")
    img = np.full((8, 8), 99, np.uint8)
    good = encode_jpeg_gray(img.tobytes(), 8, 8)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[:40])
    # entropy data cut mid-stream
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(good[:-4])


def test_phash_cross_format_png_vs_jpeg():
    """The SAME image encoded as PNG and as JPEG must land within a
    few pHash bits — cross-format near-dup detection, impossible with
    the md5 stand-in of earlier rounds."""
    from mcm_problem_f_data_wrangling_spark.operators.multimodal import (
        encode_png,
        phash64_jpeg,
        phash64_png,
    )

    rs = np.random.RandomState(21)
    img = np.kron(rs.randint(0, 256, size=(8, 8)).astype(np.uint8), np.ones((8, 8), np.uint8))
    hp = phash64_png(encode_png(img.tobytes(), 64, 64, 1))
    hj = phash64_jpeg(encode_jpeg_gray(img.tobytes(), 64, 64))
    hamming = bin((hp ^ hj) & ((1 << 64) - 1)).count("1")
    assert hamming <= 6, hamming


def test_mean_formula_cross_engine_shape():
    """The oracle computes AVG over 6 block constants; the decoder
    computes the mean over all 384 pixels — equal as rationals and as
    doubles (the 64x count factor is a power of two)."""
    vals = [128 + 2 * k for k in (0, 5, 17, 23, 31, 47)]
    a = sum(vals) / 6.0
    b = sum(v * 64 for v in vals) / 384.0
    assert a == b and math.floor(a) <= 255
