"""Feature registry: assembles the complete feature bank the reference supports
(feature_type x audio_format), each as a single pure jittable function
waveform (n_ch, n_samples) -> feature (C, T, F).

Feature types (parity with reference dataset/*_feature_extraction.py):
  salsa        log-linear compressed spec (4) + normalized eigenvector (3)      [foa|mic]
  salsa_lite   log-linear spec 9kHz crop (4) + freq-normalized IPD (3)          [mic]
  salsa_ipd    log-linear spec 9kHz crop (4) + IPD/pi (3)                       [mic]
  linspeciv    log-linear compressed spec (4) + intensity vector (3)            [foa]
  melspeciv    log-mel spec (4) + mel intensity vector (3)                      [foa]
  linspecgcc   log-linear compressed spec (4) + GCC-PHAT (6)                    [mic]
  melspecgcc   log-mel spec (4) + GCC-PHAT w/ 4kHz notch (6)                    [mic]
  melspec      log-mel spec (n_ch)                                              [any]
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from salsa_tpu.dsp.filterbank import mel_filterbank, high_freq_compression_matrix
from salsa_tpu.features.specs import (
    multichannel_spectra,
    log_projected_spec,
    foa_intensity_vectors,
    gcc_phat_all_pairs,
    gcc_phat_lowpass_filter,
)
from salsa_tpu.features.salsa import SalsaParams, extract_salsa
from salsa_tpu.features.salsa_lite import SalsaLiteParams, extract_salsa_lite


@dataclass
class FeatureExtractor:
    """A compiled feature extractor with its metadata."""

    name: str
    audio_format: str
    n_channels: int          # channels in the produced feature map
    n_features: int          # freq dimension of the produced feature map
    n_spec_channels: int     # leading channels that are dB-spectrograms (scaler scope)
    description: str         # directory-naming string (parity with reference layout)
    fn: Callable[[jnp.ndarray], jnp.ndarray] = field(repr=False)

    def __call__(self, wave) -> jnp.ndarray:
        return self.fn(jnp.asarray(wave))


def _mel_projected_features(wave, melW, n_fft, hop_length, win_length, with_iv):
    X = multichannel_spectra(wave, n_fft, hop_length, win_length)
    spec = log_projected_spec(X, melW)
    if not with_iv:
        return spec
    iv = foa_intensity_vectors(X, melW)
    return jnp.concatenate([spec, iv], axis=0)


def _gcc_features(wave, proj, n_fft, hop_length, win_length, n_out, freq_filter):
    X = multichannel_spectra(wave, n_fft, hop_length, win_length)
    spec = log_projected_spec(X, proj)
    gcc = gcc_phat_all_pairs(wave, n_fft, hop_length, win_length, n_out, freq_filter)
    return jnp.concatenate([spec, gcc], axis=0)


def make_extractor(
    feature_type: str,
    audio_format: str,
    fs: int = 24000,
    n_fft: int = 512,
    hop_length: int = 300,
    win_length: int | None = None,
    n_mels: int = 128,
    fmin: float = 50.0,
    fmax: float | None = None,
    fmin_doa: float = 50.0,
    fmax_doa: float | None = None,
    condition_number: float = 5.0,
    n_hopframes: int = 3,
    is_tracking: bool = True,
    compress_high_freq: bool = True,
    eig_method: str = "auto",
    jit: bool = True,
) -> FeatureExtractor:
    if win_length is None:
        win_length = n_fft
    if eig_method == "auto":
        # fused Pallas kernel on real TPUs, batched XLA power iteration elsewhere
        eig_method = "power" if jax.default_backend() == "cpu" or not is_tracking else "pallas"
    if fmax is None:
        fmax = fs // 2
    fmax = min(fmax, fs // 2)

    if feature_type == "salsa":
        if fmax_doa is None:
            fmax_doa = 9000.0 if audio_format == "foa" else 4000.0
        p = SalsaParams(
            fs=fs, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            fmin_doa=fmin_doa, fmax_doa=fmax_doa, audio_format=audio_format,
            condition_number=condition_number, n_hopframes=n_hopframes,
            is_tracking=is_tracking, compress_high_freq=compress_high_freq,
            eig_method=eig_method,
        )
        fn = partial(extract_salsa, params=p)
        desc = f"{fs}fs_{n_fft}nfft_{hop_length}nhop_{int(condition_number)}cond_{int(min(fmax_doa, fs // 2))}fmaxdoa"
        if not is_tracking:
            desc += "_notracking"
        if not compress_high_freq:
            desc += "_nocompress"
        meta = dict(n_channels=7, n_features=p.freq_dim, n_spec_channels=4, description=desc)
    elif feature_type in ("salsa_lite", "salsa_ipd"):
        if fmax_doa is None:
            fmax_doa = 2000.0
        p = SalsaLiteParams(
            fs=fs, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            fmin_doa=fmin_doa, fmax_doa=fmax_doa,
            normalize="lite" if feature_type == "salsa_lite" else "ipd",
        )
        fn = partial(extract_salsa_lite, params=p)
        desc = f"{fs}fs_{n_fft}nfft_{hop_length}nhop_{int(min(fmax_doa, fs // 2))}fmaxdoa"
        meta = dict(n_channels=7, n_features=p.n_features, n_spec_channels=4, description=desc)
    elif feature_type in ("melspec", "melspeciv", "melspecgcc"):
        melW = jnp.asarray(mel_filterbank(fs, n_fft, n_mels, fmin, fmax))
        if feature_type == "melspecgcc":
            ncorr = 2 * n_fft - 1
            big_n_fft = int(2 ** np.ceil(np.log2(ncorr)))
            filt = gcc_phat_lowpass_filter(fs, big_n_fft)
            fn = partial(_gcc_features, proj=melW, n_fft=n_fft, hop_length=hop_length,
                         win_length=win_length, n_out=n_mels, freq_filter=filt)
            n_channels = 10
        else:
            fn = partial(_mel_projected_features, melW=melW, n_fft=n_fft,
                         hop_length=hop_length, win_length=win_length,
                         with_iv=feature_type == "melspeciv")
            n_channels = 7 if feature_type == "melspeciv" else 4
        desc = f"{fs}fs_{n_fft}nfft_{hop_length}nhop_{n_mels}nmels"
        # classic features: the reference scaler fits/normalizes ALL channels
        # (feature_extraction.py:526-594 + database.py:199-202)
        meta = dict(n_channels=n_channels, n_features=n_mels,
                    n_spec_channels=n_channels, description=desc)
    elif feature_type in ("linspeciv", "linspecgcc"):
        W = jnp.asarray(high_freq_compression_matrix(n_fft, compress_high_freq))
        n_freqs = W.shape[0]
        if feature_type == "linspecgcc":
            fn = partial(_gcc_features, proj=W, n_fft=n_fft, hop_length=hop_length,
                         win_length=win_length, n_out=n_freqs, freq_filter=None)
            n_channels = 10
        else:
            fn = partial(_mel_projected_features, melW=W, n_fft=n_fft,
                         hop_length=hop_length, win_length=win_length, with_iv=True)
            n_channels = 7
        desc = f"{fs}fs_{n_fft}nfft_{hop_length}nhop_{n_freqs}nfreqs"
        meta = dict(n_channels=n_channels, n_features=n_freqs,
                    n_spec_channels=n_channels, description=desc)
    else:
        raise ValueError(f"unknown feature type '{feature_type}'")

    if jit:
        fn = jax.jit(fn)
    return FeatureExtractor(name=feature_type, audio_format=audio_format, fn=fn, **meta)


FEATURE_REGISTRY = (
    "salsa", "salsa_lite", "salsa_ipd",
    "linspeciv", "melspeciv", "linspecgcc", "melspecgcc", "melspec",
)


def feature_n_channels(feature_type: str) -> int:
    return {"salsa": 7, "salsa_lite": 7, "salsa_ipd": 7, "linspeciv": 7,
            "melspeciv": 7, "linspecgcc": 10, "melspecgcc": 10, "melspec": 4}[feature_type]


def feature_n_spec_channels(feature_type: str) -> int:
    """Channels covered by the normalization scaler: SALSA-family scales only the
    spectrogram channels; classic features scale everything (reference parity)."""
    if feature_type in ("salsa", "salsa_lite", "salsa_ipd"):
        return 4
    return feature_n_channels(feature_type)
