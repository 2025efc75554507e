"""Frequency-axis projection matrices: Slaney mel filterbank (librosa-compatible) and
the SALSA high-frequency compression matrix.

These are built once on host in NumPy (they are tiny constants baked into the jit
graph as weights of a single matmul, which the MXU eats for free).
"""
from __future__ import annotations

import numpy as np


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    hz = m * f_sp
    log_region = m >= min_log_mel
    hz = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)
    return hz


def mel_filterbank(
    fs: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    dtype=np.float32,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank of shape
    (n_mels, n_fft//2 + 1); numerically equivalent to
    librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with default htk=False,
    norm='slaney' (used by the reference at dataset/feature_extraction.py:45)."""
    if fmax is None:
        fmax = fs / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, fs / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    weights = np.zeros((n_mels, n_bins), dtype=np.float64)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney-style energy normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(dtype)


def high_freq_compression_matrix(n_fft: int, compress: bool = True, dtype=np.float32) -> np.ndarray:
    """SALSA's frequency-compression projection.

    Keeps bins 1..k as-is (dropping the DC bin) and averages the bins above the 9 kHz
    cutoff in groups of 8 so the feature dim lands on 200 (n_fft=512) / 100 (n_fft=256).
    Matches MagStftExtractor.W in the reference (salsa_feature_extraction.py:153-175),
    including the last row averaging only 7 bins while still dividing by 8.
    """
    n_bins = n_fft // 2 + 1
    if not compress:
        W = np.zeros((n_fft // 2, n_bins), dtype=dtype)
        W[np.arange(n_fft // 2), np.arange(1, n_fft // 2 + 1)] = 1.0
        return W
    if n_fft == 512:
        n_out, n_keep = 200, 192
    elif n_fft == 256:
        n_out, n_keep = 100, 96
    else:
        raise ValueError("high-freq compression defined for n_fft in (256, 512)")
    W = np.zeros((n_out, n_bins), dtype=dtype)
    W[np.arange(n_keep), np.arange(1, n_keep + 1)] = 1.0
    for row in range(n_keep, n_out):
        start = n_keep + 1 + (row - n_keep) * 8
        stop = min(start + 8, n_bins - 1)  # Nyquist bin excluded (last row sums 7 bins / 8)
        W[row, start:stop] = 1.0 / 8.0
    return W
