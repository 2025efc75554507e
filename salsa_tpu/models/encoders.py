"""CNN encoders. `PannResNet22` mirrors the reference encoder of the same name
(reference models/encoders.py:26-56): ConvBlock(n_in->64, 2x2 avgpool) followed by a
[2,2,2,2] basic-block ResNet; output stride 16 in time, 8 in frequency, 512 channels.
Input layout: NHWC (B, T, F, C)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from salsa_tpu.ops.dropout import FastDropout

from salsa_tpu.models.layers import DoubleConvBlock, ResNetTrunk


class PannResNet22(nn.Module):
    n_input_channels: int = 7
    p_dropout: float = 0.0
    n_output_channels: int = 512
    time_downsample_ratio: int = 16
    freq_downsample_ratio: int = 8
    compute_dtype: str | None = None  # e.g. 'bfloat16' for mixed-precision training

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, F, C) -> (B, T/16, F/8, 512)."""
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if dtype is not None:
            x = x.astype(dtype)
        x = DoubleConvBlock(64, pool_type="avg", dtype=dtype)(x, train)
        x = FastDropout(self.p_dropout)(x, deterministic=not train)
        x = ResNetTrunk(layers=(2, 2, 2, 2), dtype=dtype)(x, train)
        return x


ENCODERS = {"PannResNet22": PannResNet22}
