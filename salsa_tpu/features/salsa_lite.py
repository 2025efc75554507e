"""SALSA-Lite / SALSA-IPD features (MIC format): log-linear spectrograms (cropped to a
9 kHz cutoff) + normalized interchannel phase differences vs mic 0.

Independently reimplements the semantics of reference
dataset/salsa_lite_feature_extraction.py:91-123 as one pure jittable function:
  * log specs: |STFT|^2 -> dB, bins [lower_bin, cutoff_bin)
  * phase vector: angle(X_m * conj(X_0)), m=1..3
      - salsa_ipd: divided by pi
      - salsa_lite: divided by (delta * freq_bin), delta = 2*pi*fs/(n_fft*c)
  * phase zeroed at/above the spatial-aliasing bin (upper_bin).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from salsa_tpu.dsp.stft import stft, power_to_db, cabs2

SPEED_OF_SOUND = 343.0


@dataclass(frozen=True)
class SalsaLiteParams:
    fs: int = 24000
    n_fft: int = 512
    hop_length: int = 300
    win_length: int | None = None
    fmin_doa: float = 50.0
    fmax_doa: float = 2000.0
    fmax_spec: float = 9000.0
    normalize: str = "lite"  # 'lite' (freq-normalized) | 'ipd' (divide by pi)

    @property
    def lower_bin(self) -> int:
        return max(1, int(np.floor(self.fmin_doa * self.n_fft / self.fs)))

    @property
    def upper_bin(self) -> int:
        fmax_doa = min(self.fmax_doa, self.fs // 2)
        return int(np.floor(fmax_doa * self.n_fft / self.fs))

    @property
    def cutoff_bin(self) -> int:
        return min(int(np.floor(self.fmax_spec * self.n_fft / self.fs)), self.n_fft // 2)

    @property
    def n_features(self) -> int:
        return self.cutoff_bin - self.lower_bin


def extract_salsa_lite(wave: jnp.ndarray, params: SalsaLiteParams) -> jnp.ndarray:
    """(4, n_samples) MIC waveform -> (7, n_frames, cutoff_bin - lower_bin) feature."""
    p = params
    X = stft(wave, n_fft=p.n_fft, hop_length=p.hop_length, win_length=p.win_length)
    log_specs = power_to_db(cabs2(X))  # (4, T, bins)

    phase = jnp.angle(X[1:] * jnp.conj(X[0:1]))  # (3, T, bins)
    if p.normalize == "ipd":
        phase = phase / np.pi
    elif p.normalize == "lite":
        delta = 2.0 * np.pi * p.fs / (p.n_fft * SPEED_OF_SOUND)
        freq_vector = np.arange(p.n_fft // 2 + 1, dtype=np.float32)
        freq_vector[0] = 1.0
        phase = phase / (delta * freq_vector)
    else:
        raise ValueError(f"unknown salsa_lite normalization '{p.normalize}'")

    # crop to spectrogram band, zero phase at/above the aliasing frequency
    log_specs = log_specs[:, :, p.lower_bin : p.cutoff_bin]
    phase = phase[:, :, p.lower_bin : p.cutoff_bin]
    keep = (np.arange(p.lower_bin, p.cutoff_bin) < p.upper_bin).astype(np.float32)
    phase = phase * keep

    return jnp.concatenate([log_specs, phase], axis=0)


extract_salsa_lite_jit = jax.jit(extract_salsa_lite, static_argnames=("params",))
