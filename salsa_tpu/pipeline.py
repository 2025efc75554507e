"""Fused end-to-end SELD pipeline: raw multichannel waveform -> SELD predictions in
ONE jit graph (feature extraction + normalization + CRNN + rate alignment).

This is the TPU-native architecture the offline HDF5 flow wraps (SURVEY.md §7): for
serving and evaluation nothing ever leaves the chip between the audio samples and the
classwise event/DOA outputs. The offline extraction CLI reuses the same feature
kernels and just dumps their output to disk for parity testing / scaler fitting.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from salsa_tpu.features.registry import FeatureExtractor
from salsa_tpu.models.seld import SeldNet, interpolate_index_repeat


class SeldInferencePipeline:
    """waveform (n_ch, n_samples) or batch (B, n_ch, n_samples) -> predictions.

    Args:
        extractor: a FeatureExtractor from `make_extractor` (jit=False is fine; the
            pipeline jits the fused graph itself).
        model: a SeldNet.
        variables: {'params', 'batch_stats'} trained variables.
        scaler: (mean, std) arrays of shape (n_scaler_chan, 1, F) from the feature
            store; only the leading n_scaler_chan channels are normalized (SALSA
            convention).
        interp_ratio: encoder-rate -> label-rate index-repeat factor.
    """

    def __init__(self, extractor: FeatureExtractor, model: SeldNet, variables,
                 scaler, interp_ratio: float, n_classes: int,
                 output_format: str = "reg_xyz"):
        self.extractor = extractor
        self.model = model
        # commit weights to the device once: checkpoint restores hand back
        # host-numpy leaves, which would otherwise re-upload per dispatch
        self.variables = jax.device_put(variables)
        mean, std = scaler
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)
        self.interp_ratio = float(interp_ratio)
        self.n_classes = n_classes
        self.output_format = output_format
        self._fn = jax.jit(self._forward)

    def _normalize(self, feat):
        n_sc = self.mean.shape[0]
        head = (feat[:n_sc] - self.mean) / self.std
        return jnp.concatenate([head, feat[n_sc:]], axis=0)

    def _forward(self, waves, params, batch_stats):
        feats = jax.vmap(lambda w: self._normalize(self.extractor.fn(w)))(waves)
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, feats, train=False
        )
        event_logit = interpolate_index_repeat(out["event_frame_logit"], self.interp_ratio)
        doa = interpolate_index_repeat(out["doa_frame_output"], self.interp_ratio)
        if self.output_format == "accdoa":
            x = doa[..., : self.n_classes]
            y = doa[..., self.n_classes : 2 * self.n_classes]
            z = doa[..., 2 * self.n_classes :]
            event_prob = jnp.sqrt(x**2 + y**2 + z**2)
        else:
            event_prob = jax.nn.sigmoid(event_logit)
        return event_prob, doa

    def __call__(self, waves) -> tuple[np.ndarray, np.ndarray]:
        """Returns (event_prob, doa_xyz) at label rate, as numpy arrays."""
        waves = jnp.asarray(waves)
        squeeze = waves.ndim == 2
        if squeeze:
            waves = waves[None]
        event_prob, doa = self._fn(
            waves, self.variables["params"], self.variables["batch_stats"]
        )
        event_prob, doa = np.asarray(event_prob), np.asarray(doa)
        if squeeze:
            event_prob, doa = event_prob[0], doa[0]
        return event_prob, doa
