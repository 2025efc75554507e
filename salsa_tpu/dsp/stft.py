"""Multichannel STFT and log-power utilities as pure jittable JAX functions.

Numerical semantics match librosa's defaults used throughout the reference
(center=True, reflect padding, periodic Hann; see reference
dataset/salsa_feature_extraction.py:186-192), because SELD parity targets require
bit-level-close features. Layout convention here is TPU-friendly:
channels lead, time before frequency: (..., n_frames, n_bins).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, identical to scipy/librosa default."""
    n = win_length if periodic else win_length - 1
    k = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(dtype)


def n_stft_frames(n_samples: int, hop_length: int, n_fft: int, center: bool = True) -> int:
    """Number of STFT frames produced for a signal of given length."""
    if center:
        return 1 + n_samples // hop_length
    return 1 + (n_samples - n_fft) // hop_length


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice (..., n_samples) into overlapping frames (..., n_frames, frame_length).

    TPU-friendly implementation: reshape the signal into hop-sized rows and
    concatenate ceil(frame/hop) shifted row views — contiguous slices only, no
    gather (XLA's TPU gather lowering is ~100x slower than these pure copies).
    """
    n_samples = x.shape[-1]
    n_frames = 1 + (n_samples - frame_length) // hop_length
    r = -(-frame_length // hop_length)  # rows of length `hop` spanned by one frame
    rows_needed = n_frames + r - 1
    padded_len = rows_needed * hop_length
    if padded_len > n_samples:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, padded_len - n_samples)]
        x = jnp.pad(x, pad)
    else:
        x = x[..., :padded_len]
    rows = x.reshape(x.shape[:-1] + (rows_needed, hop_length))
    parts = [rows[..., k : k + n_frames, :] for k in range(r)]
    frames = jnp.concatenate(parts, axis=-1)
    return frames[..., :frame_length]


@functools.lru_cache(maxsize=8)
def _windowed_dft_matrices(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases with the analysis window folded in: (n_fft, n_bins) each.
    rfft(frame * window) == frame @ cos_mat  +  1j * (frame @ sin_mat)."""
    window = hann_window(win_length, dtype=np.float64)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.concatenate(
            [np.zeros(lpad), window, np.zeros(n_fft - win_length - lpad)]
        )
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = -2.0 * np.pi * t * k / n_fft
    cos_mat = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_mat = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_mat, sin_mat


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "center", "pad_mode", "method"),
)
def stft(
    x: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 300,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
    method: str = "auto",
) -> jnp.ndarray:
    """Multichannel STFT.

    Args:
        x: (..., n_samples) float signal (any number of leading batch/channel dims).
        method: 'fft' (jnp.fft.rfft), 'matmul' (windowed-DFT matmul — much faster on
            TPU for n_fft <= ~1024 because it runs on the MXU instead of XLA's FFT),
            or 'auto' (matmul for small n_fft).
    Returns:
        Complex spectrogram (..., n_frames, n_fft//2 + 1).
    """
    if win_length is None:
        win_length = n_fft
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)

    if method == "auto":
        method = "matmul" if n_fft <= 2048 else "fft"
    if method == "matmul":
        cos_mat, sin_mat = _windowed_dft_matrices(n_fft, win_length)
        real = frames @ jnp.asarray(cos_mat)
        imag = frames @ jnp.asarray(sin_mat)
        return jax.lax.complex(real, imag)

    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


def istft_frames(spec: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Inverse rFFT per frame (no overlap-add) — used by GCC-PHAT."""
    return jnp.fft.irfft(spec, n=n_fft, axis=-1)


@functools.lru_cache(maxsize=8)
def _irfft_selected_bases(n_fft: int, out_idx: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag inverse-DFT bases evaluating irfft ONLY at `out_idx` samples:
    irfft(X, n)[t] = X_re @ C[:, t] + X_im @ S[:, t]."""
    n_bins = n_fft // 2 + 1
    t = np.asarray(out_idx, dtype=np.float64)[None, :]
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    angle = 2.0 * np.pi * k * t / n_fft
    w = np.full((n_bins, 1), 2.0 / n_fft)
    w[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        w[-1] = 1.0 / n_fft
    C = (np.cos(angle) * w).astype(np.float32)
    S = (-np.sin(angle) * w).astype(np.float32)
    return C, S


def irfft_selected(spec: jnp.ndarray, n_fft: int, out_idx: tuple) -> jnp.ndarray:
    """Inverse rFFT evaluated only at the requested output samples, as two MXU
    matmuls — much faster than XLA's TPU FFT and skips unneeded lags.

    spec: complex (..., n_fft//2+1). Returns (..., len(out_idx))."""
    C, S = _irfft_selected_bases(n_fft, tuple(int(i) for i in out_idx))
    return jnp.real(spec) @ jnp.asarray(C) + jnp.imag(spec) @ jnp.asarray(S)


def cabs2(z: jnp.ndarray) -> jnp.ndarray:
    """|z|^2 as re^2 + im^2 — skips the sqrt/square round-trip of jnp.abs(z)**2
    AND keeps the complex tensor out of the graph when its only other consumers
    are real()/imag() (XLA then never materializes the complex64 pack). Differs
    from abs-then-square by <=1 ulp; only used ahead of continuous maps
    (power_to_db), never ahead of threshold comparisons."""
    return jnp.square(jnp.real(z)) + jnp.square(jnp.imag(z))


def power_to_db(
    power: jnp.ndarray,
    ref: float = 1.0,
    amin: float = 1e-10,
    top_db: float | None = None,
) -> jnp.ndarray:
    """10*log10 with clamping, matching librosa.power_to_db semantics
    (reference uses ref=1.0, amin=1e-10, top_db=None everywhere)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(power, amin))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec
