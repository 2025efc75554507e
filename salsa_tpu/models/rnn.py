"""Recurrent decoders (GRU / LSTM, uni- or bidirectional, multi-layer) written
TPU-first: the input projection for ALL timesteps is hoisted out of the recurrence
into one big MXU matmul, and only the (B, H) @ (H, 3H|4H) hidden update runs inside
`lax.scan`. Gate math matches torch.nn.GRU / torch.nn.LSTM exactly so the reference's
published CRNN behaves identically here (reference decoders.py:36-62).

Initialization parity (reference model_utils.py:159-184 `init_gru`): input weights
uniform(+-sqrt(3/fan_in)) per gate; hidden weights uniform for r,z (GRU) with the
candidate-gate block orthogonal; biases zero.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _uniform_fanin_init(n_gates: int, orthogonal_last: bool = False):
    """Per-gate init for stacked gate matrices of shape (fan_in, n_gates*H)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, total = shape
        h = total // n_gates
        keys = jax.random.split(key, n_gates)
        limit = np.sqrt(3.0 / fan_in)
        blocks = []
        for g in range(n_gates):
            if orthogonal_last and g == n_gates - 1:
                blocks.append(nn.initializers.orthogonal()(keys[g], (fan_in, h), dtype))
            else:
                blocks.append(jax.random.uniform(keys[g], (fan_in, h), dtype, -limit, limit))
        return jnp.concatenate(blocks, axis=1)

    return init


class GRULayer(nn.Module):
    """Single-direction GRU layer over (B, T, D) -> (B, T, H)."""

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.hidden_size
        wi = self.param("wi", _uniform_fanin_init(3), (D, 3 * H))
        wh = self.param("wh", _uniform_fanin_init(3, orthogonal_last=True), (H, 3 * H))
        bi = self.param("bi", nn.initializers.zeros, (3 * H,))
        bh = self.param("bh", nn.initializers.zeros, (3 * H,))

        # one MXU matmul for every timestep's input projection
        xproj = x @ wi + bi  # (B, T, 3H)
        if self.reverse:
            xproj = jnp.flip(xproj, axis=1)

        def step(h, xp):
            hproj = h @ wh + bh  # (B, 3H)
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hproj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((B, H), dtype=xproj.dtype)
        _, ys = lax.scan(step, h0, jnp.swapaxes(xproj, 0, 1), unroll=8)
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class LSTMLayer(nn.Module):
    """Single-direction LSTM layer over (B, T, D) -> (B, T, H). Torch gate order i,f,g,o."""

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.hidden_size
        wi = self.param("wi", _uniform_fanin_init(4), (D, 4 * H))
        wh = self.param("wh", _uniform_fanin_init(4, orthogonal_last=True), (H, 4 * H))
        bi = self.param("bi", nn.initializers.zeros, (4 * H,))
        bh = self.param("bh", nn.initializers.zeros, (4 * H,))

        xproj = x @ wi + bi
        if self.reverse:
            xproj = jnp.flip(xproj, axis=1)

        def step(carry, xp):
            h, c = carry
            gates = xp + h @ wh + bh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H), xproj.dtype), jnp.zeros((B, H), xproj.dtype))
        _, ys = lax.scan(step, init, jnp.swapaxes(xproj, 0, 1), unroll=8)
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class RNNStack(nn.Module):
    """Multi-layer (bi)directional RNN with inter-layer dropout (torch semantics:
    dropout after every layer except the last)."""

    cell: str = "gru"  # 'gru' | 'lstm'
    hidden_size: int = 256
    num_layers: int = 2
    bidirectional: bool = True
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool):
        layer_cls = GRULayer if self.cell == "gru" else LSTMLayer
        for layer in range(self.num_layers):
            fwd = layer_cls(self.hidden_size, reverse=False, name=f"l{layer}_fwd")(x)
            if self.bidirectional:
                bwd = layer_cls(self.hidden_size, reverse=True, name=f"l{layer}_bwd")(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
            if layer < self.num_layers - 1 and self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x
