"""Pure stdlib+numpy audio featurization for WAV blobs: RIFF/WAVE PCM
decode (stdlib ``wave``) and a from-the-textbook MFCC pipeline (framing →
Hann window → power spectrum → mel filterbank → log → DCT-II), written
from the public definitions (Davis & Mermelstein 1980; HTK/librosa docs).

Purpose: the audio operators' REAL featurization branch
(multimodal.extract_audio_features) must be executable even where
librosa/soundfile are absent — WAV blobs produce actual spectral
coefficients in any environment, with librosa remaining the preferred
tier when importable (it covers mp3/flac/etc. and battle-tested edge
cases).  Runs inside Arrow-batched ``mapInPandas`` workers; nothing here
touches the driver.
"""

from __future__ import annotations

import io
import wave

import numpy as np


class WavError(ValueError):
    """Bytes that are not a PCM WAV this codec supports."""


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode PCM WAV bytes → ``(sample_rate, mono float64 waveform in
    [-1, 1])``.  8/16/24/32-bit integer PCM; multi-channel mixes down by
    mean.  Raises ``WavError`` on non-WAV or compressed variants."""
    if not is_wav(data):
        raise WavError("not a RIFF/WAVE signature")
    try:
        with wave.open(io.BytesIO(data)) as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            sr = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise WavError(str(e)) from None
    if width == 1:  # unsigned 8-bit
        y = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        y = (y - 128.0) / 128.0
    elif width == 2:
        y = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 3:  # 24-bit: widen to int32 via byte stuffing
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        stuffed = np.zeros((b.shape[0], 4), dtype=np.uint8)
        stuffed[:, 1:] = b
        y = (stuffed.view("<i4").ravel() >> 8).astype(np.float64) / 8388608.0
    elif width == 4:
        y = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise WavError(f"unsupported sample width {width}")
    if n_ch > 1:
        y = y.reshape(-1, n_ch).mean(axis=1)
    return sr, y


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Triangular mel filters over the rfft bins — (n_mels, n_fft//2+1)."""
    mels = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    hz = _mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * hz / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        mid = max(mid, lo + 1)
        hi = max(hi, mid + 1)
        for k in range(lo, min(mid, fb.shape[1])):
            fb[i, k] = (k - lo) / (mid - lo)
        for k in range(mid, min(hi, fb.shape[1])):
            fb[i, k] = (hi - k) / (hi - mid)
    return fb


def _dct2_ortho(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in) — the MFCC decorrelator."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    m[0] *= 1.0 / np.sqrt(n_in)
    m[1:] *= np.sqrt(2.0 / n_in)
    return m


def mfcc_frames(
    y: np.ndarray,
    sr: int,
    n_mfcc: int = 13,
    n_frames: int = 4,
    n_fft: int = 512,
    n_mels: int = 26,
) -> list[list[float]]:
    """MFCC matrix over ``n_frames`` equal spans of the waveform — the
    same (frame, coefficient) shape the librosa tier and the sha stub
    produce, so every tier is drop-in interchangeable downstream."""
    if y.size == 0:
        y = np.zeros(n_fft)
    n_fft = min(n_fft, max(16, 1 << int(np.log2(max(y.size, 16)))))
    fb = mel_filterbank(sr, n_fft, n_mels)
    dct = _dct2_ortho(n_mfcc, n_mels)
    window = np.hanning(n_fft)
    out = []
    for f in range(n_frames):
        start = (f * max(y.size - n_fft, 0)) // max(n_frames - 1, 1)
        frame = y[start : start + n_fft]
        if frame.size < n_fft:
            frame = np.pad(frame, (0, n_fft - frame.size))
        spec = np.abs(np.fft.rfft(frame * window)) ** 2
        mel = fb @ spec
        logmel = np.log(mel + 1e-10)
        out.append((dct @ logmel).tolist())
    return out
