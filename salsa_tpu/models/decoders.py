"""SELD decoder: frequency pooling -> sequence decoder (gru / bigru / lstm / bilstm /
transformer) -> SED classification head + per-axis DOA regression heads.

Parity with reference models/decoders.py:13-154: bigru default (2 layers, hidden 256,
dropout 0.3), SED head FC(fc)->relu->FC(n_classes) with 0.2 dropouts, DOA = three
independent FC stacks with tanh, concatenated (x | y | z) per class.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from salsa_tpu.ops.dropout import FastDropout

from salsa_tpu.models.layers import (
    TransformerEncoderLayer,
    sinusoid_position_encoding,
    xavier_uniform,
)
from salsa_tpu.models.rnn import RNNStack


class SeldDecoder(nn.Module):
    n_output_channels: int = 512   # encoder output channels
    n_classes: int = 12
    output_format: str = "reg_xyz"
    decoder_type: str = "bigru"
    decoder_size: int = 256
    freq_pool: str = "avg"
    head_dropout: float = 0.2
    rnn_dropout: float = 0.3
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T', F', C) encoder output -> dict of framewise outputs at T'."""
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if dtype is not None:
            x = x.astype(dtype)
        if self.freq_pool == "avg":
            x = jnp.mean(x, axis=2)
        elif self.freq_pool == "max":
            x = jnp.max(x, axis=2)
        elif self.freq_pool == "avg_max":
            x = jnp.mean(x, axis=2) + jnp.max(x, axis=2)
        else:
            raise ValueError(f"unknown freq pool '{self.freq_pool}'")
        # (B, T, C)

        if self.decoder_type in ("gru", "bigru", "lstm", "bilstm"):
            bidirectional = self.decoder_type.startswith("bi")
            cell = "gru" if "gru" in self.decoder_type else "lstm"
            x = RNNStack(
                cell=cell,
                hidden_size=self.decoder_size,
                num_layers=2,
                bidirectional=bidirectional,
                dropout_rate=self.rnn_dropout,
            )(x, train)
            fc_size = self.decoder_size * (2 if bidirectional else 1)
        elif self.decoder_type == "transformer":
            d_model = self.n_output_channels
            pe = sinusoid_position_encoding(2000, d_model)
            x = x + jnp.asarray(pe)[None, : x.shape[1], :]
            for _ in range(2):
                x = TransformerEncoderLayer(d_model=d_model)(x, train)
            fc_size = d_model
        else:
            raise ValueError(f"unknown decoder type '{self.decoder_type}'")

        def head(h, name):
            h = FastDropout(self.head_dropout)(h, deterministic=not train)
            h = nn.relu(nn.Dense(fc_size // 2, kernel_init=xavier_uniform,
                                 dtype=dtype, name=f"{name}_fc1")(h))
            h = FastDropout(self.head_dropout)(h, deterministic=not train)
            return nn.Dense(self.n_classes, kernel_init=xavier_uniform,
                            dtype=dtype, name=f"{name}_fc2")(h)

        event_logit = head(x, "event").astype(jnp.float32)
        doa = jnp.concatenate(
            [jnp.tanh(head(x, axis).astype(jnp.float32)) for axis in ("x", "y", "z")],
            axis=-1,
        )
        return {"event_frame_logit": event_logit, "doa_frame_output": doa}


DECODERS = {"SeldDecoder": SeldDecoder}
