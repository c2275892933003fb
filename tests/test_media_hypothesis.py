"""Property-based fuzz for the round-8 media codecs: MP4 metadata
roundtrip and the audio spectral pipeline, pure-Python side (no Spark
session — these target the codec/DSP functions the Arrow stages call).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mcm_problem_f_data_wrangling_spark.operators.mp4 import (
    encode_mp4_stub_video,
    parse_mp4_metadata,
)
from mcm_problem_f_data_wrangling_spark.operators.multimodal import (
    decode_wav,
    encode_wav_pcm16,
)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=8192),
    h=st.integers(min_value=1, max_value=8192),
    nf=st.integers(min_value=1, max_value=100_000),
    ts=st.integers(min_value=1, max_value=1_000_000),
    fd=st.integers(min_value=1, max_value=10_000),
)
def test_mp4_metadata_roundtrip(w, h, nf, ts, fd):
    # bound mdat size: the encoder writes 16 bytes/frame of filler —
    # cap the product so examples stay fast
    nf = min(nf, 2000)
    p = encode_mp4_stub_video(w, h, nf, ts, fd)
    assert parse_mp4_metadata(p) == (w, h, nf, nf * fd, ts)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_mp4_truncation_always_clean_valueerror(data):
    p = encode_mp4_stub_video(64, 64, 4)
    cut = data.draw(st.integers(min_value=0, max_value=len(p) - 1))
    try:
        parse_mp4_metadata(p[:cut])
    except ValueError:
        pass  # the only acceptable failure class
    # a prefix that still contains the full moov tree parses fine


@settings(max_examples=30, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=600
    ),
    sr=st.integers(min_value=1, max_value=192_000),
    channels=st.integers(min_value=1, max_value=4),
)
def test_wav_roundtrip_any_payload(samples, sr, channels):
    n = (len(samples) // channels) * channels
    samples = samples[:n]
    sr2, ch2, n2, got = decode_wav(encode_wav_pcm16(samples, sr, channels))
    assert (sr2, ch2, n2) == (sr, channels, len(samples))
    assert got == samples


@settings(max_examples=20, deadline=None)
@given(
    bands=st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=8),
    amp=st.integers(min_value=100, max_value=30_000),
)
def test_bin_center_tone_band_recovery(bands, amp):
    """The DSP core the Arrow stage runs: any bin-center tone sequence
    at any amplitude must recover its planted band per frame."""
    frame_len, n_bands = 256, 8
    u = np.arange(2 * frame_len)
    sig = np.concatenate(
        [
            np.round(amp * np.cos(2.0 * np.pi * (16 * b + 8) * u / frame_len))
            for b in bands
        ]
    )
    nf = len(sig) // frame_len
    frames = sig[: nf * frame_len].reshape(nf, frame_len)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    bins = spec[:, 1 : frame_len // 2 + 1]
    got = bins.reshape(nf, n_bands, -1).sum(axis=2).argmax(axis=1)
    expected = [b for b in bands for _ in range(2)]
    assert list(got) == expected
