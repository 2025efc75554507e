"""Shared Flax building blocks: conv blocks, ResNet blocks, positional encoding.

Architecture parity with the reference model zoo (models/model_utils.py), TPU-first
layout: all convs run NHWC (B, time, freq, channels) so XLA tiles channels onto lanes;
the public model API still accepts the dataset's (B, C, T, F).

Reference quirks preserved because they shape the published results:
  * ResNet blocks downsample with a pre-conv 2x2 average pool instead of strided conv
    (model_utils.py:348-349);
  * the residual's second BN is zero-initialized (model_utils.py:343);
  * dropout p=0.1 inside every basic block (model_utils.py:356);
  * downsample shortcut = avgpool + 1x1 conv + BN (model_utils.py:474-481);
  * Xavier-uniform init for convs/linears, zeros for biases (model_utils.py:133-150).
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from salsa_tpu.ops.dropout import FastDropout

xavier_uniform = nn.initializers.glorot_uniform()
Dtype = Any


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class ConvBnRelu(nn.Module):
    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3), use_bias=False, kernel_init=xavier_uniform,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class DoubleConvBlock(nn.Module):
    """Two 3x3 conv+BN+relu followed by 2x2 pooling (reference ConvBlock)."""

    features: int
    pool_type: str = "avg"  # 'avg' | 'max' | 'avg+max'
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBnRelu(self.features, dtype=self.dtype)(x, train)
        x = ConvBnRelu(self.features, dtype=self.dtype)(x, train)
        if self.pool_type == "avg":
            return avg_pool_2x2(x)
        if self.pool_type == "max":
            return max_pool_2x2(x)
        if self.pool_type == "avg+max":
            return avg_pool_2x2(x) + max_pool_2x2(x)
        if self.pool_type == "none":  # caller handles pooling (PannResNet22TPU stem)
            return x
        raise ValueError(f"unknown pool type {self.pool_type}")


class ResNetBasicBlock(nn.Module):
    features: int
    stride: int = 1
    use_shortcut_proj: bool = False
    dropout_rate: float = 0.1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = avg_pool_2x2(x) if self.stride == 2 else x
        out = nn.Conv(self.features, (3, 3), use_bias=False, kernel_init=xavier_uniform,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        out = FastDropout(self.dropout_rate)(out, deterministic=not train)
        out = nn.Conv(self.features, (3, 3), use_bias=False, kernel_init=xavier_uniform,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            scale_init=nn.initializers.zeros, dtype=self.dtype,
        )(out)
        if self.use_shortcut_proj:
            if self.stride == 2:
                identity = avg_pool_2x2(identity)
            identity = nn.Conv(self.features, (1, 1), use_bias=False,
                               kernel_init=xavier_uniform, dtype=self.dtype)(identity)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class ResNetBottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (expansion 4), reference parity with
    models/model_utils.py:372-426 — unused by any shipped reference model but part
    of its model-zoo surface: pre-conv 2x2 avg-pool when stride==2, dropout p=0.1
    after the 3x3, zero-initialized final BN, avgpool+1x1+BN shortcut."""

    features: int            # "planes"; output channels = 4 * features
    stride: int = 1
    use_shortcut_proj: bool = False
    dropout_rate: float = 0.1
    expansion: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = avg_pool_2x2(x) if self.stride == 2 else x
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=xavier_uniform, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), use_bias=False,
                      kernel_init=xavier_uniform, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        out = FastDropout(self.dropout_rate)(out, deterministic=not train)
        out = nn.Conv(self.expansion * self.features, (1, 1), use_bias=False,
                      kernel_init=xavier_uniform, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           scale_init=nn.initializers.zeros, dtype=self.dtype)(out)
        if self.use_shortcut_proj:
            if self.stride == 2:
                identity = avg_pool_2x2(identity)
            identity = nn.Conv(self.expansion * self.features, (1, 1), use_bias=False,
                               kernel_init=xavier_uniform, dtype=self.dtype)(identity)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class ResNetTrunk(nn.Module):
    """Four stages of residual blocks, [64,128,256,512], first stage stride 1.
    block='basic' (reference PannResNet22) or 'bottleneck' (expansion-4,
    reference _ResnetBottleneck — its zoo's deeper-encoder variant)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    in_features: int = 64
    block: str = "basic"  # 'basic' | 'bottleneck'
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        expansion = 1 if self.block == "basic" else 4
        block_cls = ResNetBasicBlock if self.block == "basic" else ResNetBottleneckBlock
        in_feats = self.in_features
        for stage, (n_blocks, width) in enumerate(zip(self.layers, self.widths)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                first = b == 0
                x = block_cls(
                    features=width,
                    stride=stride if first else 1,
                    use_shortcut_proj=first and (stride != 1
                                                 or in_feats != width * expansion),
                    dtype=self.dtype,
                )(x, train)
            in_feats = width * expansion
        return x


def sinusoid_position_encoding(pos_len: int, d_model: int, scale: float = 0.1) -> np.ndarray:
    """0.1-scaled sin/cos table (reference PositionalEncoding, model_utils.py:266-284)."""
    pe = np.zeros((pos_len, d_model), dtype=np.float32)
    pos = np.arange(pos_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = scale * np.sin(pos * div)
    pe[:, 1::2] = scale * np.cos(pos * div)
    return pe


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch nn.TransformerEncoderLayer semantics)."""

    d_model: int
    n_heads: int = 8
    dim_feedforward: int = 1024
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
        )(x, x)
        attn = FastDropout(self.dropout_rate)(attn, deterministic=not train)
        x = nn.LayerNorm()(x + attn)
        y = nn.Dense(self.dim_feedforward)(x)
        y = nn.relu(y)
        y = FastDropout(self.dropout_rate)(y, deterministic=not train)
        y = nn.Dense(self.d_model)(y)
        y = FastDropout(self.dropout_rate)(y, deterministic=not train)
        return nn.LayerNorm()(x + y)
