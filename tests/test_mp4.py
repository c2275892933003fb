"""MP4 container metadata (operators/mp4.py): box-walk parser,
encoder twin, version-1 headers, and error paths."""

from __future__ import annotations

import struct

import pytest

from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
    _box,
    _fullbox,
    _UNITY_MATRIX,
    encode_mp4_stub_video,
    extract_mp4_metadata,
    parse_mp4_metadata,
)


@pytest.mark.parametrize(
    "w,h,nf,ts,fd",
    [(320, 240, 48, 600, 25), (1920, 1080, 240, 90000, 3000), (16, 16, 1, 600, 1)],
)
def test_roundtrip(w, h, nf, ts, fd):
    p = encode_mp4_stub_video(w, h, nf, ts, fd)
    assert parse_mp4_metadata(p) == (w, h, nf, nf * fd, ts)


def test_version1_mvhd_and_tkhd():
    """64-bit (version 1) movie/track headers parse identically —
    real muxers emit v1 for long durations."""
    w, h, nf, ts, fd = 640, 360, 10, 600, 30
    base = encode_mp4_stub_video(w, h, nf, ts, fd)
    dur = nf * fd
    mvhd_v1 = _fullbox(
        b"mvhd", 1, 0,
        struct.pack(">QQIQ", 0, 0, ts, dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8 + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd_v1 = _fullbox(
        b"tkhd", 1, 0x3,
        struct.pack(">QQIIQ", 0, 0, 1, 0, dur)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    # rebuild: swap the v0 headers for v1 inside the existing tree
    moov_off = base.rindex(b"moov") - 4
    moov_body = base[moov_off + 8:]
    old_mvhd_len = struct.unpack(">I", moov_body[:4])[0]
    trak = moov_body[old_mvhd_len:]
    old_tkhd_len = struct.unpack(">I", trak[8:12])[0]
    new_trak_body = tkhd_v1 + trak[8 + old_tkhd_len:]
    new_moov = _box(b"moov", mvhd_v1 + _box(b"trak", new_trak_body))
    assert parse_mp4_metadata(base[:moov_off] + new_moov) == (w, h, nf, dur, ts)


def test_multi_entry_stts_sums_counts():
    """n_frames is the stts sample-count SUM (variable-frame-rate
    files carry many entries)."""
    p = bytearray(encode_mp4_stub_video(64, 64, 30, 600, 20))
    one = _fullbox(b"stts", 0, 0, struct.pack(">III", 1, 30, 20))
    two = _fullbox(
        b"stts", 0, 0, struct.pack(">I", 2) + struct.pack(">II", 12, 20)
        + struct.pack(">II", 18, 20)
    )
    assert len(two) == len(one) + 8
    i = bytes(p).index(one)
    patched = bytes(p[:i]) + two + bytes(p[i + len(one):])
    # grow every ancestor box size (moov..stbl wrap the stts)
    out = bytearray(patched)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = out.index(fourcc) - 4
        (sz,) = struct.unpack(">I", out[j : j + 4])
        out[j : j + 4] = struct.pack(">I", sz + 8)
    w, h, nf, dur, ts = parse_mp4_metadata(bytes(out))
    assert (w, h, nf) == (64, 64, 30)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"\x00\x00\x00\x18ftypmp42" + b"m" * 40,  # bogus box sizes
        encode_mp4_stub_video(8, 8, 2)[:60],  # truncated mid-tree
        b"RIFF1234WAVE",  # wrong container entirely
    ],
)
def test_corrupt_raises_clean_valueerror(payload):
    with pytest.raises(ValueError):
        parse_mp4_metadata(payload)


def test_extract_mp4_metadata_stage(spark):
    rows = [
        (i, encode_mp4_stub_video(160 + 16 * i, 90 + 9 * i, 10 + i), "video", "x")
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, ["media_id", "payload", "media_type", "source_uri"]
    )
    got = {r.media_id: r for r in extract_mp4_metadata(df).collect()}
    for i in range(4):
        r = got[i]
        assert (r.width, r.height, r.n_frames) == (160 + 16 * i, 90 + 9 * i, 10 + i)
        assert r.duration == (10 + i) * 25 and r.timescale == 600
