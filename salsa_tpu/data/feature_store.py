"""Per-clip HDF5 feature store + streaming normalization scaler.

Directory layout is kept byte-compatible with the reference
(`<feature_dir>/<feature_type>/<fmt>/<description>/<split>/<clip>.h5` with a 'feature'
dataset, and `<fmt>_feature_scaler.h5` holding 'mean'/'std'; see reference
salsa_feature_extraction.py:253-256,380-382) so features extracted by either framework
are interchangeable.
"""
from __future__ import annotations

import os

import h5py
import numpy as np


class StreamingScaler:
    """Accumulates per-channel, per-frequency mean/std over (C, T, F) feature clips.

    Equivalent to sklearn StandardScaler.partial_fit per channel (the reference's
    compute_scaler), without the sklearn dependency: exact streaming sums in float64.
    """

    def __init__(self, n_channels: int):
        self.n_channels = n_channels
        self.count = 0
        self._sum = None
        self._sumsq = None

    def update(self, feature: np.ndarray) -> None:
        x = feature[: self.n_channels].astype(np.float64)  # (C, T, F)
        if self._sum is None:
            self._sum = x.sum(axis=1)
            self._sumsq = (x**2).sum(axis=1)
        else:
            self._sum += x.sum(axis=1)
            self._sumsq += (x**2).sum(axis=1)
        self.count += x.shape[1]

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        """Returns (mean, std) of shape (C, 1, F)."""
        mean = self._sum / self.count
        var = self._sumsq / self.count - mean**2
        std = np.sqrt(np.maximum(var, 0.0))
        return (
            mean[:, None, :].astype(np.float32),
            std[:, None, :].astype(np.float32),
        )


class FeatureStore:
    """Reads/writes per-clip features and the split-level scaler."""

    def __init__(self, root_dir: str, audio_format: str):
        self.root_dir = root_dir
        self.audio_format = audio_format

    def split_dir(self, split_kind: str) -> str:
        # split_kind: 'dev' | 'eval'
        return os.path.join(self.root_dir, f"{self.audio_format}_{split_kind}")

    def clip_path(self, split_kind: str, clip_name: str) -> str:
        return os.path.join(self.split_dir(split_kind), clip_name + ".h5")

    def write_clip(self, split_kind: str, clip_name: str, feature: np.ndarray) -> None:
        os.makedirs(self.split_dir(split_kind), exist_ok=True)
        with h5py.File(self.clip_path(split_kind, clip_name), "w") as hf:
            hf.create_dataset("feature", data=feature, dtype=np.float32)

    def read_clip(self, split_kind: str, clip_name: str) -> np.ndarray:
        with h5py.File(self.clip_path(split_kind, clip_name), "r") as hf:
            return hf["feature"][:]

    @property
    def scaler_path(self) -> str:
        return os.path.join(self.root_dir, f"{self.audio_format}_feature_scaler.h5")

    def write_scaler(self, mean: np.ndarray, std: np.ndarray) -> None:
        os.makedirs(self.root_dir, exist_ok=True)
        with h5py.File(self.scaler_path, "w") as hf:
            hf.create_dataset("mean", data=mean, dtype=np.float32)
            hf.create_dataset("std", data=std, dtype=np.float32)

    def read_scaler(self) -> tuple[np.ndarray, np.ndarray]:
        with h5py.File(self.scaler_path, "r") as hf:
            return hf["mean"][:], hf["std"][:]

    def has_scaler(self) -> bool:
        return os.path.isfile(self.scaler_path)
