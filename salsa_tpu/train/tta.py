"""Test-time augmentation over the array's spatial symmetries.

The reference reports "w/ TTA" headline numbers but ships no TTA code; here it is a
first-class option: run inference under every channel-swap symmetry variant, map the
DOA predictions back through the inverse label transform (a signed permutation of
the x/y/z class blocks), and average.

The inverse maps are derived *empirically* from the same deterministic transform
functions used for training augmentation (data/transforms.py), so the TTA algebra can
never drift from the augmentation algebra.
"""
from __future__ import annotations

import itertools

import numpy as np

from salsa_tpu.data.transforms import (
    swap_channel_foa,
    swap_channel_gcc,
    swap_channel_mic,
)


_KIND_FNS = {
    "foa": (swap_channel_foa, 4, 7),
    "mic": (swap_channel_mic, 3, 7),
    "gcc": (swap_channel_gcc, 3, 10),
}


def tta_kind(feature_type: str, audio_format: str) -> str:
    """Map a (feature_type, audio_format) stream to its TTA symmetry group."""
    if feature_type.endswith("gcc"):
        return "gcc"
    return audio_format


class ChannelSwapTTA:
    """Enumerates all symmetry variants for a (feature_type, audio_format) stream.

    kind: 'foa' (tf-map FOA: 16 variants) | 'mic' (tf-map MIC: 8 variants) |
    'gcc' (GCC-lag MIC: 4 variants — its generators are mutually exclusive
    (reference if/elif semantics), so the group is {identity, g0, g1, g2}).
    """

    def __init__(self, kind: str, n_classes: int,
                 n_input_channels: int | None = None):
        if kind not in _KIND_FNS:
            raise ValueError(f"TTA kind '{kind}' not supported")
        self.kind = kind
        self.n_classes = n_classes
        self.fn, n_bits, self.n_channels = _KIND_FNS[kind]
        if n_input_channels is not None and n_input_channels != self.n_channels:
            # fail at config time, not on the first batch inside predict_split
            raise ValueError(
                f"TTA kind '{kind}' needs {self.n_channels}-channel features, but "
                f"this stream has {n_input_channels} channels — channel-swap TTA "
                "only applies to directional feature types (salsa/iv/gcc)")
        if kind == "gcc":
            self.masks = [np.array(m) for m in
                          ((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1))]
        else:
            self.masks = [np.array(m)
                          for m in itertools.product((0, 1), repeat=n_bits)]
        self._label_mats = [self._label_matrix(m) for m in self.masks]

    def _label_matrix(self, m) -> np.ndarray:
        """3x3 signed permutation L with doa_new_blocks = L @ doa_old_blocks,
        measured by pushing unit block vectors through the label transform.
        Probed for two distinct classes (0 and n-1) to *verify*, not assume, that
        the swap algebra is class-independent."""
        n = self.n_classes
        dummy_x = np.zeros((self.n_channels, 2, 2), dtype=np.float32)
        sed = np.zeros((1, n), dtype=np.float32)
        mats = []
        for cls in {0, n - 1}:
            L = np.zeros((3, 3))
            for axis in range(3):
                doa = np.zeros((1, 3 * n), dtype=np.float32)
                doa[0, axis * n + cls] = 1.0  # class `cls`, unit along `axis`
                _, _, doa_t = self.fn(dummy_x, sed, doa, m, n)
                for out_axis in range(3):
                    L[out_axis, axis] = doa_t[0, out_axis * n + cls]
            mats.append(L)
        if len(mats) == 2 and not np.array_equal(mats[0], mats[1]):
            raise AssertionError(
                f"label transform for mask {m} is class-dependent — TTA inverse "
                "derivation assumption violated")
        return mats[0]

    def __len__(self):
        return len(self.masks)

    def transform_features(self, x: np.ndarray, idx: int) -> np.ndarray:
        """x: (B, C, T, F) batch; returns transformed copy."""
        m = self.masks[idx]
        n = self.n_classes
        sed = np.zeros((1, n), dtype=np.float32)
        doa = np.zeros((1, 3 * n), dtype=np.float32)
        out = np.empty_like(x)
        for b in range(x.shape[0]):
            out[b], _, _ = self.fn(x[b], sed, doa, m, n)
        return out

    def inverse_doa(self, doa: np.ndarray, idx: int) -> np.ndarray:
        """Map predictions made in the transformed frame back: apply L^-1 = L^T to
        the (x, y, z) class blocks. doa: (..., 3*n_classes)."""
        n = self.n_classes
        L_inv = self._label_mats[idx].T
        blocks = np.stack(
            [doa[..., :n], doa[..., n : 2 * n], doa[..., 2 * n :]], axis=0
        )  # (3, ..., n)
        mapped = np.einsum("oa,a...->o...", L_inv, blocks)
        return np.concatenate([mapped[0], mapped[1], mapped[2]], axis=-1)
