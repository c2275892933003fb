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


def _jpeg_frames(n: int, w: int = 16, h: int = 8, seed: int = 0):
    """n constant-block baseline JPEGs (even offsets — exact decode)."""
    import numpy as np

    from mcm_problem_f_data_wrangling_spark.operators.jpeg import encode_jpeg_gray

    frames, means = [], []
    for f in range(n):
        img = np.zeros((h, w), dtype=np.uint8)
        for bi in range(h // 8):
            for bj in range(w // 8):
                img[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = (
                    128 + 2 * ((seed * 5 + f * 7 + bi * 13 + bj * 29) % 48)
                )
        frames.append(encode_jpeg_gray(img.tobytes(), w, h))
        means.append(img.mean(dtype="float64"))
    return frames, means


def test_mjpeg_sample_roundtrip():
    """encode_mp4_mjpeg_video → parse_mp4_samples returns the exact
    JPEG payloads in order, with the jpeg codec fourcc."""
    from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
        encode_mp4_mjpeg_video,
        parse_mp4_codec_hint,
        parse_mp4_samples,
    )

    frames, _ = _jpeg_frames(5)
    p = encode_mp4_mjpeg_video(frames, 16, 8)
    assert parse_mp4_metadata(p) == (16, 8, 5, 5 * 25, 600)
    assert parse_mp4_codec_hint(p) == "jpeg"
    codec, got = parse_mp4_samples(p)
    assert codec == "jpeg" and got == frames


def test_stub_codec_hint_and_samples():
    from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
        encode_mp4_stub_video,
        parse_mp4_codec_hint,
        parse_mp4_samples,
    )

    p = encode_mp4_stub_video(320, 240, 4)
    assert parse_mp4_codec_hint(p) == "stub"
    codec, samples = parse_mp4_samples(p)
    assert codec == "stub" and len(samples) == 4
    assert all(len(s) == 16 for s in samples)


def test_mjpeg_sample_table_corruption_raises():
    """A sample range past EOF must raise the clean ValueError class,
    not an arbitrary slice/struct error."""
    from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
        encode_mp4_mjpeg_video,
        parse_mp4_samples,
    )

    frames, _ = _jpeg_frames(2)
    p = bytearray(encode_mp4_mjpeg_video(frames, 16, 8))
    i = p.find(b"stsz")
    # inflate the first per-sample size entry (stsz fourcc + ver/flags
    # + sample_size(4) + count(4) = 12 bytes to the table)
    struct.pack_into(">I", p, i + 12, 10_000_000)
    with pytest.raises(ValueError, match="MP4"):
        parse_mp4_samples(bytes(p))


def test_decode_media_fills_mjpeg_mean_luma(spark):
    """The decode_media video branch must produce REAL mean_luma for
    MJPEG MP4s (exact mean over all frames' pixels) and keep it NULL
    for the stub codec (the env-blocked H.264 stand-in)."""
    from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
        encode_mp4_mjpeg_video,
        encode_mp4_stub_video,
    )
    from mcm_problem_f_data_wrangling_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )

    frames, means = _jpeg_frames(3, seed=2)
    media = spark.createDataFrame(
        [
            (0, encode_mp4_mjpeg_video(frames, 16, 8), "video", "p://mjpeg"),
            (1, encode_mp4_stub_video(320, 240, 7), "video", "p://stub"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in decode_media(media).collect()}
    assert rows[0].n_frames == 3 and rows[0].width == 16
    assert rows[0].mean_luma == pytest.approx(
        sum(means) / len(means) / 255.0, abs=1e-12
    )
    assert rows[1].mean_luma is None  # honest NULL: no jpeg/mjpa track


def _jpeg_frame(w, h, seed):
    from mcm_problem_f_data_wrangling_spark.operators.jpeg import encode_jpeg_gray

    px = [(seed + 7 * x + 13 * y) % 256 for y in range(h) for x in range(w)]
    return encode_jpeg_gray(px, w, h)


def test_mp4_av_pcm_roundtrip_sowt_and_twos():
    """encode_mp4_av -> parse_mp4_audio_track recovers the exact
    interleaved int16 stream, rate and channel count for both PCM
    endiannesses, while the VIDEO path (first track) is untouched."""
    from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
        encode_mp4_av,
        parse_mp4_audio_track,
        parse_mp4_metadata,
        parse_mp4_samples,
    )

    frames = [_jpeg_frame(16, 8, s) for s in (1, 2)]
    samples = [((37 * i) % 4001) - 2000 for i in range(2 * 600)]  # stereo
    for fmt in ("sowt", "twos"):
        payload = encode_mp4_av(
            frames, 16, 8, samples, 8000, channels=2, audio_fmt=fmt
        )
        got_fmt, sr, ch, got = parse_mp4_audio_track(payload)
        assert (got_fmt, sr, ch) == (fmt, 8000, 2)
        assert got == samples
        w, h, nf, _, _ = parse_mp4_metadata(payload)
        assert (w, h, nf) == (16, 8, 2)
        codec, vid = parse_mp4_samples(payload)
        assert codec == "jpeg" and vid == frames


def test_mp4_audio_track_errors():
    import pytest

    from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
        NoAudioTrackError,
        encode_mp4_mjpeg_video,
        parse_mp4_audio_track,
    )

    video_only = encode_mp4_mjpeg_video([_jpeg_frame(8, 8, 3)], 8, 8)
    # the DEDICATED type (not message text) is what demux_mp4_audio
    # keys its benign-skip on — a ValueError subclass so generic
    # callers still see a ValueError
    with pytest.raises(NoAudioTrackError, match="no soun track"):
        parse_mp4_audio_track(video_only)
    with pytest.raises(ValueError):
        parse_mp4_audio_track(b"\x00" * 16)


def test_demux_mp4_audio_bridges_to_wav_operators(spark):
    """The demux stage re-encodes the soun track as WAV so the
    existing audio fingerprint stack runs on video corpora unchanged;
    video-only MP4s emit nothing, NULL payloads are tolerated."""
    import numpy as np

    from mcm_problem_f_data_wrangling_spark.operators.audio import (
        audio_fingerprint,
    )
    from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
        demux_mp4_audio,
        encode_mp4_av,
        encode_mp4_mjpeg_video,
    )
    from mcm_problem_f_data_wrangling_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_wav_pcm16,
    )

    u = np.arange(512)
    tone = [int(x) for x in np.round(900.0 * np.cos(2.0 * np.pi * 40 * u / 256.0))]
    av = encode_mp4_av([_jpeg_frame(16, 8, 5)], 16, 8, tone, 8000)
    vid_only = encode_mp4_mjpeg_video([_jpeg_frame(16, 8, 6)], 16, 8)
    rows = [
        (1, av, "video", "planted://av/1"),
        (2, vid_only, "video", "planted://vid/2"),
        (3, None, "video", "planted://null/3"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    demuxed = demux_mp4_audio(media)
    got = demuxed.collect()
    assert [r["media_id"] for r in got] == [1]
    assert got[0]["sample_rate"] == 8000 and got[0]["n_samples"] == 512
    # the demuxed WAV fingerprint equals the same tone's native-WAV one
    wav = spark.createDataFrame(
        [(9, encode_wav_pcm16(tone, 8000), "audio", "planted://wav/9")],
        MEDIA_SCHEMA,
    )
    fp_mp4 = audio_fingerprint(demuxed).select("fingerprint").first()[0]
    fp_wav = audio_fingerprint(wav).select("fingerprint").first()[0]
    assert fp_mp4 == fp_wav
