"""Memory-light dropout for big activations.

The stock flax/jax dropout costs ~half of this framework's entire CRNN train step
(measured: 125 ms -> 65 ms per batch-32 step with dropout removed): it draws one
f32 uniform per element (4 bytes written + read back per activation element) and
the autodiff rule then SAVES the keep-mask from forward to backward — hundreds of
MB of residual traffic per step for the encoder's ~250M activation elements.

This implementation removes both costs (PRNG bit generation itself remains —
keep the rbg PRNG, train/state.py::dropout_rng's default; threefry bit
generation alone is ~50 ms/step at these activation sizes):

  * the keep decision is a raw uint32 threshold compare (`jax.random.bits`) —
    no f32 uniforms, and XLA fuses compare+select into the surrounding op; and
  * a custom VJP REGENERATES the identical mask in backward from the same PRNG
    key instead of storing it — dropout contributes zero residuals.

Keep probability resolution is 2^-32 (indistinguishable from exact bernoulli).
Semantics match torch/flax inverted dropout: zero with probability `rate`,
survivors scaled by 1/(1-rate); eval mode is identity. The reference applies
p=0.1 inside every ResNet block (models/model_utils.py:356) — the hot site.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn


def _mask_scale(x: jnp.ndarray, key, rate: float) -> jnp.ndarray:
    bits = jax.random.bits(key, x.shape, jnp.uint32)
    threshold = jnp.uint32(min(int(round(rate * 2.0**32)), 2**32 - 1))
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(bits >= threshold, x * scale, jnp.zeros((), x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dropout(x: jnp.ndarray, key, rate: float) -> jnp.ndarray:
    """Inverted dropout with mask regeneration in backward (see module docstring)."""
    return _mask_scale(x, key, rate)


def _dropout_fwd(x, key, rate):
    return _mask_scale(x, key, rate), key


def _dropout_bwd(rate, key, g):
    # same key -> bit-identical mask; the residual is 8 bytes of PRNG key
    return _mask_scale(g, key, rate), None


dropout.defvjp(_dropout_fwd, _dropout_bwd)


class FastDropout(nn.Module):
    """Drop-in replacement for nn.Dropout (rng collection 'dropout')."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        return dropout(x, self.make_rng("dropout"), self.rate)
