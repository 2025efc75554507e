"""Import modules of the reference implementation (/root/reference) as test oracles.

The environment lacks two of the reference's dependencies — `librosa` and `fire` —
so this installs minimal shims before import:

  * `fire` is stubbed out entirely (only used for CLI dispatch at module bottom).
  * `librosa` gets a numpy shim covering exactly the API surface the reference
    extractor classes touch: `stft` (librosa 0.8 semantics — center=True reflect
    pad, periodic window via scipy.signal.get_window exactly as librosa does,
    win_length zero-centered in the n_fft frame), `power_to_db`, and
    `filters.mel`, which delegates to `transformers.audio_utils.mel_filter_bank`
    (an independent reimplementation of librosa's Slaney filterbank — NOT this
    repo's own). The shim stft is itself parity-tested against torch.stft in
    tests/test_reference_parity.py, so "reference module + shim" is a genuinely
    independent oracle for everything around the STFT primitive.

numpy>=2 compat: the reference uses `np.float`, removed in numpy 2.
"""
from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np

REF = "/root/reference"


def _shim_stft(y, n_fft=2048, hop_length=None, win_length=None, window="hann",
               center=True, pad_mode="reflect", dtype=None):
    import scipy.signal

    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 4
    w = scipy.signal.get_window(window, win_length, fftbins=True)
    lpad = (n_fft - win_length) // 2
    w = np.pad(w, (lpad, n_fft - win_length - lpad))
    y = np.asarray(y, dtype=np.float64)
    if center:
        y = np.pad(y, n_fft // 2, mode=pad_mode)
    n_frames = 1 + (len(y) - n_fft) // hop_length
    idx = np.arange(n_fft)[:, None] + hop_length * np.arange(n_frames)[None, :]
    return np.fft.rfft(y[idx] * w[:, None], axis=0)


def _shim_power_to_db(S, ref=1.0, amin=1e-10, top_db=80.0):
    S = np.asarray(S)
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def _shim_mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, norm="slaney",
              dtype=np.float32):
    from transformers.audio_utils import mel_filter_bank

    if fmax is None:
        fmax = float(sr) / 2
    m = mel_filter_bank(
        num_frequency_bins=n_fft // 2 + 1, num_mel_filters=n_mels,
        min_frequency=float(fmin), max_frequency=float(fmax), sampling_rate=sr,
        norm="slaney" if norm == "slaney" else None,
        mel_scale="htk" if htk else "slaney",
    )
    return m.T.astype(dtype)  # transformers returns (freq, mel); librosa is (mel, freq)


def install_shims() -> None:
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001 - numpy 2 compat for the reference code
    if "fire" not in sys.modules:
        fire = types.ModuleType("fire")
        fire.Fire = lambda *a, **k: None
        sys.modules["fire"] = fire
    if "librosa" not in sys.modules:
        # import transformers BEFORE stubbing librosa: its import machinery probes
        # find_spec("librosa"), which chokes on a spec-less stub module
        import transformers.audio_utils  # noqa: F401

        import importlib.machinery

        lib = types.ModuleType("librosa")
        lib.__spec__ = importlib.machinery.ModuleSpec("librosa", None)
        lib.stft = _shim_stft
        lib.power_to_db = _shim_power_to_db
        filters = types.ModuleType("librosa.filters")
        filters.mel = _shim_mel
        lib.filters = filters
        sys.modules["librosa"] = lib
        sys.modules["librosa.filters"] = filters
    if "IPython" not in sys.modules:
        ipy = types.ModuleType("IPython")
        ipy.embed = lambda *a, **k: None
        sys.modules["IPython"] = ipy


def load_reference_module(name: str):
    """Import e.g. 'dataset.salsa_feature_extraction' from the reference repo.
    Returns None when the reference is not present (tests should skip)."""
    if not os.path.isdir(REF):
        return None
    install_shims()
    sys.path.insert(0, REF)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(REF)
