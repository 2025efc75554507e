"""Slow, loop-based NumPy oracle implementations used for golden-parity testing of the
JAX kernels. Written deliberately in the naive per-frame / per-bin style (the same
style as the reference implementation) so that vectorization bugs in the fast JAX
paths cannot hide."""
from __future__ import annotations

import numpy as np


def oracle_hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def oracle_stft(x: np.ndarray, n_fft: int, hop: int, win_length: int | None = None) -> np.ndarray:
    """Single-channel STFT, librosa semantics (center=True, reflect pad, periodic hann).
    Returns (n_bins, n_frames) like librosa."""
    if win_length is None:
        win_length = n_fft
    w = oracle_hann(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.concatenate([np.zeros(lpad), w, np.zeros(n_fft - win_length - lpad)])
    xp = np.pad(x, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    out = np.zeros((n_fft // 2 + 1, n_frames), dtype=np.complex128)
    for t in range(n_frames):
        seg = xp[t * hop : t * hop + n_fft] * w
        out[:, t] = np.fft.rfft(seg)
    return out


def oracle_power_to_db(p: np.ndarray, amin: float = 1e-10, ref: float = 1.0) -> np.ndarray:
    return 10.0 * np.log10(np.maximum(p, amin)) - 10.0 * np.log10(np.maximum(amin, ref))


def oracle_normalized_eigenvector(
    X: np.ndarray,
    condition_number: float = 5.0,
    n_hopframes: int = 3,
    is_tracking: bool = True,
    audio_format: str = "foa",
    fs: int = 24000,
    n_fft: int = 512,
    lower_bin: int = 1,
) -> np.ndarray:
    """Per-frame/per-bin loop oracle for the SALSA spatial feature: noise-floor
    tracking -> windowed spatial covariance -> principal eigenvector -> coherence test
    -> FOA/MIC normalization. Semantics follow reference
    salsa_feature_extraction.py:17-129 exactly (independent reimplementation)."""
    n_bins, n_frames, n_chans = X.shape

    n_sig_frames = 3
    countdown = np.full(n_bins, n_sig_frames, dtype=int)
    alpha = 0.02
    floor_up = 1 + alpha
    floor_up_slow = 1 + 0.1 * alpha
    floor_down = 1 - alpha
    snr_ratio = 1.5

    delta = 2 * np.pi * fs / (n_fft * 343.0)

    Xp = np.pad(X, ((0, 0), (n_hopframes, n_hopframes), (0, 0)), mode="wrap")

    # tracking signal: 3-frame running average magnitude of channel 0
    mag = np.zeros((n_bins, n_frames))
    for i in range(3):
        seg = Xp[:, n_hopframes - i : n_hopframes - i + n_frames, 0]
        mag += np.abs(seg) ** 2
    mag = np.sqrt(mag / 3)

    floor = 0.5 * np.mean(mag[:, 0:5], axis=1)
    out = np.zeros((n_chans - 1, n_bins, n_frames))

    for t in range(n_frames):
        xf = mag[:, t]
        above = xf > floor
        countdown[above] -= 1
        neg = countdown < 0
        floor[above & neg] *= floor_up_slow
        floor[above & ~neg] *= floor_up
        countdown[~above] = n_sig_frames
        floor[~above] *= floor_down
        floor[floor < 1e-6] = 1e-6
        sig = xf > snr_ratio * floor
        valid = sig if is_tracking else np.ones(n_bins, dtype=bool)
        for b in range(n_bins):
            if not valid[b]:
                continue
            X1 = Xp[b, t : t + 2 * n_hopframes + 1, :]
            R = X1.T @ X1.conj() / (2 * n_hopframes + 1)
            u, s, _ = np.linalg.svd(R)
            rank1 = s[0] > s[1] * condition_number
            if is_tracking and not rank1:
                continue
            if audio_format == "foa":
                v = np.real(u[1:, 0] / u[0, 0])
                v = v / np.sqrt(np.sum(v**2))
            else:
                v = np.angle(u[1:, 0] * np.conj(u[0, 0]))
                v = v / (delta * (b + lower_bin))
            out[:, b, t] = v
    return out


def oracle_gcc_phat(sig: np.ndarray, refsig: np.ndarray, n_fft: int, hop: int,
                    win_length: int, n_out: int) -> np.ndarray:
    """Loop-based GCC-PHAT matching reference feature_extraction.py:75-118
    (without the 4 kHz low-pass; apply the filter outside if needed).
    Returns (n_frames, n_out)."""
    ncorr = 2 * n_fft - 1
    big_nfft = int(2 ** np.ceil(np.log2(ncorr)))
    Px = oracle_stft(sig, big_nfft, hop, win_length)
    Pref = oracle_stft(refsig, big_nfft, hop, win_length)
    R = Px * np.conj(Pref)
    n_frames = R.shape[1]
    out = np.zeros((n_frames, n_out))
    for t in range(n_frames):
        cc = np.fft.irfft(np.exp(1j * np.angle(R[:, t])))
        out[t] = np.concatenate([cc[-n_out // 2 :], cc[: n_out // 2]])
    return out
