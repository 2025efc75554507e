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

from salsa_tpu.ops.dropout import FastDropout
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


class _RNNParams(nn.Module):
    """Parameter holder sharing GRULayer/LSTMLayer's exact param tree
    ({wi, wh, bi, bh}, same shapes and initializers, so checkpoints and the
    torch-parity weight transplant are layout-identical). Returns the hoisted
    input projection plus the recurrent weights for an external fused scan."""

    hidden_size: int
    n_gates: int  # 3 = GRU, 4 = LSTM

    @nn.compact
    def __call__(self, x):
        D, H = x.shape[-1], self.hidden_size
        wi = self.param("wi", _uniform_fanin_init(self.n_gates), (D, self.n_gates * H))
        wh = self.param("wh", _uniform_fanin_init(self.n_gates, orthogonal_last=True),
                        (H, self.n_gates * H))
        bi = self.param("bi", nn.initializers.zeros, (self.n_gates * H,))
        bh = self.param("bh", nn.initializers.zeros, (self.n_gates * H,))
        return x @ wi + bi, wh, bh


def _fused_bidir_scan(cell: str, xf, xb, wh2, bh2, hidden_size: int):
    """Run the forward and (time-reversed) backward recurrences of a bidirectional
    layer in ONE lax.scan: the carry stacks both directions' states, each step does
    one batched (2, B, H) @ (2, H, G*H) hidden update. Halves the sequential scan
    chain vs two independent scans (the TPU executes scans serially), reference
    BiGRU semantics preserved exactly (ROADMAP r01 perf item: fused bidir scan)."""
    B, T, _ = xf.shape
    H = hidden_size
    xs = jnp.stack([xf, jnp.flip(xb, axis=1)], axis=0)        # (2, B, T, G*H)
    xs = jnp.moveaxis(xs, 2, 0)                               # (T, 2, B, G*H)

    if cell == "gru":
        def step(h, xp):
            hproj = jnp.einsum("dbh,dhg->dbg", h, wh2) + bh2[:, None, :]
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hproj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((2, B, H), xs.dtype)
        _, ys = lax.scan(step, h0, xs, unroll=8)              # (T, 2, B, H)
    else:
        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.einsum("dbh,dhg->dbg", h, wh2) + bh2[:, None, :]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        zero = jnp.zeros((2, B, H), xs.dtype)
        _, ys = lax.scan(step, (zero, zero), xs, unroll=8)
    fwd = jnp.swapaxes(ys[:, 0], 0, 1)                        # (B, T, H)
    bwd = jnp.flip(jnp.swapaxes(ys[:, 1], 0, 1), axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1)


class RNNStack(nn.Module):
    """Multi-layer (bi)directional RNN with inter-layer dropout (torch semantics:
    dropout after every layer except the last). Bidirectional layers run both
    directions in a single fused scan (fused=False falls back to two scans)."""

    cell: str = "gru"  # 'gru' | 'lstm'
    hidden_size: int = 256
    num_layers: int = 2
    bidirectional: bool = True
    dropout_rate: float = 0.3
    fused: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        layer_cls = GRULayer if self.cell == "gru" else LSTMLayer
        n_gates = 3 if self.cell == "gru" else 4
        for layer in range(self.num_layers):
            if self.bidirectional and self.fused:
                xf, whf, bhf = _RNNParams(self.hidden_size, n_gates,
                                          name=f"l{layer}_fwd")(x)
                xb, whb, bhb = _RNNParams(self.hidden_size, n_gates,
                                          name=f"l{layer}_bwd")(x)
                x = _fused_bidir_scan(self.cell, xf, xb, jnp.stack([whf, whb]),
                                      jnp.stack([bhf, bhb]), self.hidden_size)
            elif self.bidirectional:
                fwd = layer_cls(self.hidden_size, reverse=False, name=f"l{layer}_fwd")(x)
                bwd = layer_cls(self.hidden_size, reverse=True, name=f"l{layer}_bwd")(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = layer_cls(self.hidden_size, reverse=False, name=f"l{layer}_fwd")(x)
            if layer < self.num_layers - 1 and self.dropout_rate > 0:
                x = FastDropout(self.dropout_rate)(x, deterministic=not train)
        return x
