"""Spectral feature primitives: log-(mel|linear) spectrograms, FOA intensity vectors,
GCC-PHAT. All functions are pure JAX, batched over channels/pairs, layout (C, T, F).

Reference behaviors mirrored (independently reimplemented):
  * log-mel / log-linear multichannel specs: dataset/feature_extraction.py:224-267 and
    salsa_feature_extraction.py:177-201 — |STFT|^2 projected by a filterbank matrix,
    then power_to_db(ref=1, amin=1e-10, top_db=None).
  * FOA intensity vector: dataset/feature_extraction.py:204-218 — IV = Re(conj(W)·[Y,Z,X
    order as stored]), L2-normalized across the 3 components per TF bin, then projected
    by the same filterbank.
  * GCC-PHAT: dataset/feature_extraction.py:75-118 — double-length FFT, optional 4 kHz
    cosine-notch filter (mel variant only), per-frame irfft of the phase transform,
    center-cropped to n_out lags.

TPU notes: the filterbank projection is a single (T,bins)x(bins,F) matmul per channel
(MXU); GCC's per-frame irfft loop becomes one batched irfft over (pairs, frames).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from salsa_tpu.dsp.stft import stft, power_to_db, irfft_selected, cabs2


def multichannel_spectra(wave: jnp.ndarray, n_fft: int, hop_length: int,
                         win_length: int | None = None) -> jnp.ndarray:
    """(n_ch, n_samples) -> complex STFT (n_ch, n_frames, n_bins)."""
    return stft(wave, n_fft=n_fft, hop_length=hop_length, win_length=win_length)


def log_projected_spec(X: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """|X|^2 @ proj.T -> dB. X: (C, T, bins); proj: (F, bins). Returns (C, T, F)."""
    power = cabs2(X)
    projected = jnp.einsum("ctb,fb->ctf", power, proj)
    return power_to_db(projected)


def foa_intensity_vectors(X: jnp.ndarray, proj: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """FOA active intensity vector, normalized per TF bin then projected.

    X: (4, T, bins) complex STFT with FOA channel order (W, Y, Z, X) as stored in the
    TNSSE wavs. Returns (3, T, F) matching the reference channel order IV_Y, IV_Z, IV_X
    (i.e. conj(X[0]) * X[1:4] — see dataset/feature_extraction.py:206-218).
    """
    iv = jnp.real(jnp.conj(X[0:1]) * X[1:4])  # (3, T, bins)
    norm = jnp.sqrt(jnp.sum(iv**2, axis=0, keepdims=True)) + eps
    iv = iv / norm
    return jnp.einsum("ctb,fb->ctf", iv, proj)


def gcc_phat_lowpass_filter(fs: int, big_n_fft: int) -> np.ndarray:
    """Cosine roll-off around 4 kHz used by the mel GCC variant
    (dataset/feature_extraction.py:98-105). Gain returns to 1 above the transition
    band — faithful to the reference."""
    n_bins = big_n_fft // 2 + 1
    filt = np.ones(n_bins, dtype=np.float32)
    k_cutoff = int(4000 / fs * big_n_fft)
    k_buffer = int(400 / fs * big_n_fft)
    ramp = np.cos(np.arange(2 * k_buffer) * (np.pi / 2) / (2 * k_buffer - 1))
    lo = k_cutoff - k_buffer
    hi = min(k_cutoff + k_buffer, n_bins)
    filt[lo:hi] = ramp[: hi - lo]
    return filt


def gcc_phat_all_pairs(
    wave: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_out: int,
    freq_filter: np.ndarray | None = None,
) -> jnp.ndarray:
    """GCC-PHAT for all C*(C-1)/2 channel pairs, batched.

    Pair order matches the reference's nested loop (n, m>n):
    (0,1),(0,2),(0,3),(1,2),(1,3),(2,3) — with sig=chan m, refsig=chan n, i.e.
    R = STFT(m) * conj(STFT(n)).

    Returns (n_pairs, n_frames, n_out) of cross-correlation lags centered on zero.
    """
    n_ch = wave.shape[0]
    ncorr = 2 * n_fft - 1
    big_n_fft = int(2 ** np.ceil(np.log2(ncorr)))
    P = stft(wave, n_fft=big_n_fft, hop_length=hop_length, win_length=win_length)
    if freq_filter is not None:
        P = P * jnp.asarray(freq_filter)
    sig_idx = np.array([m for n in range(n_ch) for m in range(n + 1, n_ch)])
    ref_idx = np.array([n for n in range(n_ch) for m in range(n + 1, n_ch)])
    R = P[sig_idx] * jnp.conj(P[ref_idx])  # (pairs, T, bins)
    phase = jnp.where(jnp.abs(R) > 0, R / jnp.maximum(jnp.abs(R), 1e-30), 1.0 + 0.0j)
    # center-cropped lags [-n_out/2, n_out/2) evaluated directly via inverse-DFT
    # matmuls (MXU) instead of a full irfft + crop
    lags = tuple(range(big_n_fft - n_out // 2, big_n_fft)) + tuple(range(n_out // 2))
    return irfft_selected(phase, big_n_fft, lags)
