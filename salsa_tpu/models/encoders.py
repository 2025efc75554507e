"""CNN encoders. `PannResNet22` mirrors the reference encoder of the same name
(reference models/encoders.py:26-56): ConvBlock(n_in->64, 2x2 avgpool) followed by a
[2,2,2,2] basic-block ResNet; output stride 16 in time, 8 in frequency, 512 channels.
Input layout: NHWC (B, T, F, C)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from salsa_tpu.ops.dropout import FastDropout

from salsa_tpu.models.layers import DoubleConvBlock, ResNetTrunk, avg_pool_2x2


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


class PannResNet22TPU(nn.Module):
    """TPU-lane-aligned stem variant of PannResNet22 (beyond the reference zoo).

    Identical interface and output geometry (B, T/16, F/8, 512) and an identical
    ResNet trunk; the only change is the stem, whose 2x2 average pool moves BEFORE
    the double conv instead of after it. The reference stem (ConvBlock,
    reference models/model_utils.py:176-221) runs two 3x3 64-channel convs at the
    FULL input resolution — the two largest single ops of a train step, and
    64-wide convs fill only half of the TPU's 128-lane MXU. Pre-pooling runs them
    at quarter resolution: ~18% of step FLOPs (all half-efficiency ones) vanish
    while every later stage sees exactly the tensor shapes it would in the
    reference encoder. Opt-in (`model.encoder.name: PannResNet22TPU`); quality
    and speed deltas vs the parity encoder are measured in BENCH.md.
    """

    n_input_channels: int = 7
    p_dropout: float = 0.0
    n_output_channels: int = 512
    time_downsample_ratio: int = 16
    freq_downsample_ratio: int = 8
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, F, C) -> (B, T/16, F/8, 512)."""
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if dtype is not None:
            x = x.astype(dtype)
        x = avg_pool_2x2(x)
        x = DoubleConvBlock(64, pool_type="none", dtype=dtype)(x, train)
        x = FastDropout(self.p_dropout)(x, deterministic=not train)
        x = ResNetTrunk(layers=(2, 2, 2, 2), dtype=dtype)(x, train)
        return x


ENCODERS = {"PannResNet22": PannResNet22, "PannResNet22TPU": PannResNet22TPU}
