"""Spec-level tests for the pure stdlib+numpy WAV/MFCC codec: RIFF byte
streams are hand-assembled here (independent of the decoder), MFCCs are
checked for the structural properties real spectral features must have
(tone separation, mel ordering, determinism), and the real-featurize
branch is driven end-to-end through a Spark job."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gofeed_spark.operators.audiocodec import (
    WavError,
    decode_wav,
    is_wav,
    mel_filterbank,
    mfcc_frames,
)


def _riff(sr: int, bits: int, n_ch: int, frames: bytes) -> bytes:
    """Hand-assembled PCM WAV (independent of both the stdlib writer and
    the decoder under test)."""
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, sr, sr * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _sine(freq: float, sr: int, n: int, amp: float = 0.5) -> bytes:
    t = np.arange(n) / sr
    y = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    return y.tobytes()


def test_decode_hand_assembled_16bit():
    samples = np.array([0, 16384, -16384, 32767, -32768], dtype="<i2")
    sr, y = decode_wav(_riff(8000, 16, 1, samples.tobytes()))
    assert sr == 8000
    assert y == pytest.approx(samples.astype(float) / 32768.0)


def test_decode_24bit_and_stereo_mixdown():
    # 24-bit mono: two known samples (max positive, half negative)
    s24 = b"\xff\xff\x7f" + b"\x00\x00\xc0"  # 8388607, -4194304
    sr, y = decode_wav(_riff(16000, 24, 1, s24))
    assert y == pytest.approx([8388607 / 8388608.0, -0.5])
    # stereo 16-bit: L=+1/2, R=-1/2 → mono mean 0
    fr = struct.pack("<hh", 16384, -16384)
    _, m = decode_wav(_riff(8000, 16, 2, fr))
    assert m == pytest.approx([0.0])


def test_rejects_non_wav():
    assert not is_wav(b"plainly not audio")
    with pytest.raises(WavError):
        decode_wav(b"plainly not audio")
    with pytest.raises(WavError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVEgarbage")


def test_mel_filterbank_orders_tones():
    """A pure tone's mel spectrum must peak in a filter that increases
    with frequency — the defining property of the filterbank."""
    sr, n_fft = 8000, 512
    fb = mel_filterbank(sr, n_fft, 26)
    peaks = []
    for freq in (200.0, 1000.0, 3000.0):
        t = np.arange(n_fft) / sr
        spec = np.abs(np.fft.rfft(np.sin(2 * np.pi * freq * t))) ** 2
        peaks.append(int(np.argmax(fb @ spec)))
    assert peaks[0] < peaks[1] < peaks[2], peaks


def test_mfcc_separates_tones_and_is_deterministic():
    sr, n = 8000, 4000
    a = decode_wav(_riff(sr, 16, 1, _sine(440.0, sr, n)))[1]
    b = decode_wav(_riff(sr, 16, 1, _sine(1760.0, sr, n)))[1]
    fa = mfcc_frames(a, sr, n_mfcc=13, n_frames=4)
    fb_ = mfcc_frames(b, sr, n_mfcc=13, n_frames=4)
    assert len(fa) == 4 and all(len(r) == 13 for r in fa)
    assert fa == mfcc_frames(a, sr, n_mfcc=13, n_frames=4)  # deterministic
    # different pitches → clearly different coefficient vectors
    d = np.linalg.norm(np.array(fa) - np.array(fb_))
    assert d > 1.0, d


def test_real_wav_branch_in_spark(spark):
    """extract_audio_features end-to-end: WAV blobs produce REAL MFCCs
    (stdlib+numpy tier), non-WAV blobs keep the sha stub — both tiers in
    one Spark job, checked against out-of-Spark recomputation."""
    import hashlib

    from gofeed_spark.operators.multimodal import extract_audio_features

    sr, n = 8000, 4000
    wav = _riff(sr, 16, 1, _sine(440.0, sr, n))
    media = spark.createDataFrame(
        [(1, "audio", wav), (2, "audio", b"not audio bytes")],
        "media_id long, media_type string, content binary",
    )
    rows = extract_audio_features(media, n_mfcc=13, n_frames=4).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.media_id, {})[r.frame] = list(r.mfcc)
    y = decode_wav(wav)[1]
    expect = mfcc_frames(y, sr, n_mfcc=13, n_frames=4)
    for f in range(4):
        assert by_id[1][f] == pytest.approx(expect[f], rel=1e-9)
    d = hashlib.sha256(b"not audio bytes").digest()
    assert by_id[2][0] == pytest.approx(
        [d[c % 32] / 255.0 for c in range(13)]
    )
