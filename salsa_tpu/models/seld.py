"""SeldNet: encoder + decoder as one Flax module, plus the model registry and the
index-repeat time interpolation used to map encoder-rate outputs to label rate
(reference model_utils.py:57-75 `interpolate_tensor` — index repetition, NOT linear)."""
from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from salsa_tpu.models.encoders import ENCODERS, PannResNet22
from salsa_tpu.models.decoders import DECODERS, SeldDecoder


def interpolate_index_repeat(x: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """Resample (B, T, ...) along time: out[t] = in[floor(t / ratio)].

    Integer up/down ratios lower to repeat/stride (cheap reshape/slice on TPU); the
    general case falls back to a gather.
    """
    n_in = x.shape[1]
    ratio = float(ratio)
    n_out = int(round(n_in * ratio))
    if ratio >= 1 and abs(ratio - round(ratio)) < 1e-9:
        return jnp.repeat(x, int(round(ratio)), axis=1)
    inv = 1.0 / ratio
    if ratio < 1 and abs(inv - round(inv)) < 1e-9:
        return x[:, :: int(round(inv))]
    idx = np.floor(np.arange(n_out) / ratio).astype(np.int32)
    return x[:, idx]


class SeldNet(nn.Module):
    """CRNN for SELD. Accepts dataset-layout input (B, C, T, F)."""

    encoder_name: str = "PannResNet22"
    encoder_kwargs: dict[str, Any] | None = None
    decoder_name: str = "SeldDecoder"
    decoder_kwargs: dict[str, Any] | None = None

    def setup(self):
        enc_kwargs = dict(self.encoder_kwargs or {})
        enc_kwargs.pop("name", None)
        self.encoder = ENCODERS[self.encoder_name](**enc_kwargs)
        dec_kwargs = dict(self.decoder_kwargs or {})
        dec_kwargs.pop("name", None)
        dec_kwargs.setdefault("n_output_channels", self.encoder.n_output_channels)
        self.decoder = DECODERS[self.decoder_name](**dec_kwargs)

    def __call__(self, x, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B, C, T, F) -> (B, T, F, C)
        h = self.encoder(x, train=train)
        return self.decoder(h, train=train)

    @property
    def time_downsample_ratio(self) -> int:
        return ENCODERS[self.encoder_name]().time_downsample_ratio


def build_model(
    encoder: dict[str, Any],
    decoder: dict[str, Any],
    n_classes: int = 12,
    output_format: str = "reg_xyz",
) -> SeldNet:
    """Registry-based construction from config dicts (parity with the reference's
    builder_utils.build_model name lookup)."""
    enc = dict(encoder)
    dec = dict(decoder)
    enc_name = enc.pop("name", "PannResNet22")
    dec_name = dec.pop("name", "SeldDecoder")
    dec.setdefault("n_classes", n_classes)
    dec.setdefault("output_format", output_format)
    return SeldNet(
        encoder_name=enc_name,
        encoder_kwargs=enc,
        decoder_name=dec_name,
        decoder_kwargs=dec,
    )
