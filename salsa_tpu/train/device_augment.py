"""On-device (in-graph) data augmentation.

The reference augments on the host in NumPy inside DataLoader workers
(utilities/transforms.py); salsa_tpu keeps that path (data/transforms.py) AND offers
this TPU-native alternative: the same augmentation suite expressed as pure jnp ops
applied inside the jitted train step (per-sample keys via vmap). On a single-core
host the NumPy path can starve the chip; in-graph augmentation costs microseconds of
VPU time instead.

Deterministic cores (taking explicit symmetry masks / geometry) mirror the NumPy
implementations exactly and are tested against them; the random wrappers sample the
same distributions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# label-coupled channel swaps (deterministic cores)
# ---------------------------------------------------------------------------

def swap_channel_foa_dev(x, doa, m, n_classes):
    """x: (7, T, F); doa: (T, 3n); m: (4,) {0,1} flags (swap_xy, neg_x, neg_y, neg_z)."""
    n = n_classes
    swap = m[0].astype(bool)
    x = x.at[jnp.array([1, 3])].set(
        jnp.where(swap, x[jnp.array([3, 1])], x[jnp.array([1, 3])])
    )
    x = x.at[jnp.array([4, 6])].set(
        jnp.where(swap, x[jnp.array([6, 4])], x[jnp.array([4, 6])])
    )
    dx, dy, dz = doa[:, :n], doa[:, n : 2 * n], doa[:, 2 * n :]
    dx, dy = jnp.where(swap, dy, dx), jnp.where(swap, dx, dy)
    sx = 1.0 - 2.0 * m[1]
    sy = 1.0 - 2.0 * m[2]
    sz = 1.0 - 2.0 * m[3]
    x = x.at[6].multiply(sx).at[4].multiply(sy).at[5].multiply(sz)
    doa = jnp.concatenate([dx * sx, dy * sy, dz * sz], axis=-1)
    return x, doa


def swap_channel_mic_dev(x, doa, m, n_classes):
    """MIC tf-map generators applied sequentially (same order as the host version)."""
    n = n_classes

    def g0(args):
        x, doa = args
        x = x[jnp.array([0, 2, 1, 3, 5, 4, 6])]
        doa = jnp.concatenate([doa[:, n : 2 * n], doa[:, :n], doa[:, 2 * n :]], -1)
        return x, doa

    def g1(args):
        x, doa = args
        new = jnp.stack([
            x[3], x[1], x[2], x[0],
            x[4] - x[6], x[5] - x[6], -x[6],
        ])
        doa = jnp.concatenate(
            [-doa[:, n : 2 * n], -doa[:, :n], doa[:, 2 * n :]], -1
        )
        return new, doa

    def g2(args):
        x, doa = args
        new = jnp.stack([
            x[1], x[0], x[3], x[2],
            -x[4], x[6] - x[4], x[5] - x[4],
        ])
        doa = jnp.concatenate(
            [doa[:, :n], -doa[:, n : 2 * n], -doa[:, 2 * n :]], -1
        )
        return new, doa

    for bit, g in zip(m, (g0, g1, g2)):
        x, doa = jax.lax.cond(bit.astype(bool), g, lambda a: a, (x, doa))
    return x, doa


def swap_channel_gcc_dev(x, doa, m, n_classes):
    """MIC GCC symmetry (10-channel layout M1..M4, xc12..xc34). Like the host
    version, at most ONE generator applies (first set flag wins)."""
    n = n_classes

    def identity(args):
        return args

    def g0(args):  # swap M2 <-> M3
        x, doa = args
        new = jnp.stack([x[0], x[2], x[1], x[3],
                         x[5], x[4], x[6],
                         jnp.flip(x[7], axis=-1), x[9], x[8]])
        doa = jnp.concatenate([doa[:, n : 2 * n], doa[:, :n], doa[:, 2 * n :]], -1)
        return new, doa

    def g1(args):  # swap M1 <-> M4
        x, doa = args
        new = jnp.stack([x[3], x[1], x[2], x[0],
                         jnp.flip(x[8], axis=-1), jnp.flip(x[9], axis=-1),
                         jnp.flip(x[6], axis=-1), x[7],
                         jnp.flip(x[4], axis=-1), jnp.flip(x[5], axis=-1)])
        doa = jnp.concatenate([-doa[:, n : 2 * n], -doa[:, :n], doa[:, 2 * n :]], -1)
        return new, doa

    def g2(args):  # swap M1<->M2 and M3<->M4
        x, doa = args
        new = jnp.stack([x[1], x[0], x[3], x[2],
                         jnp.flip(x[4], axis=-1), x[8], x[7], x[6], x[5],
                         jnp.flip(x[9], axis=-1)])
        doa = jnp.concatenate([doa[:, :n], -doa[:, n : 2 * n], -doa[:, 2 * n :]], -1)
        return new, doa

    m = m.astype(bool)
    idx = jnp.where(m[0], 0, jnp.where(m[1], 1, jnp.where(m[2], 2, 3)))
    return jax.lax.switch(idx, [g0, g1, g2, identity], (x, doa))


# ---------------------------------------------------------------------------
# feature-only transforms (deterministic cores)
# ---------------------------------------------------------------------------

def freq_shift_dev(x, shift, direction_up, max_range):
    """Reflect-padded frequency shift; shift in [1, max_range), traced.
    x: (C, T, F)."""
    F = x.shape[-1]
    R = max_range
    padded = jnp.pad(x, ((0, 0), (0, 0), (R, R)), mode="reflect")
    start = jnp.where(direction_up, R - shift, R + shift)
    return jax.lax.dynamic_slice_in_dim(padded, start, F, axis=2)


def _rect_mask(T, F, top, h, left, w):
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (T, F), 0)
    f_ids = jax.lax.broadcasted_iota(jnp.int32, (T, F), 1)
    return ((t_ids >= top) & (t_ids < top + h) & (f_ids >= left) & (f_ids < left + w))


def _fill_masked(x, mask, value, n_zero_channels):
    """Fill masked area: leading channels with `value`, trailing n_zero_channels
    spatial channels with 0."""
    C = x.shape[0]
    filled = jnp.where(mask[None], value, x)
    if n_zero_channels:
        zeroed = jnp.where(mask[None], 0.0, x)
        chan = jnp.arange(C)[:, None, None]
        filled = jnp.where(chan >= C - n_zero_channels, zeroed, filled)
    return filled


def random_cutout_dev(key, x, image_aspect_ratio, n_zero_channels):
    C, T, F = x.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    s_lo, s_hi = 0.02, 0.3
    r1, r2 = 0.3, 1 / 0.3
    if image_aspect_ratio > 1:
        r1 *= image_aspect_ratio
    elif image_aspect_ratio < 1:
        r2 *= image_aspect_ratio
    s = jax.random.uniform(k1, (), minval=s_lo, maxval=s_hi) * T * F
    r = jax.random.uniform(k2, (), minval=r1, maxval=r2)
    w = jnp.minimum(jnp.sqrt(s / r).astype(jnp.int32), F - 1)
    h = jnp.minimum(jnp.sqrt(s * r).astype(jnp.int32), T - 1)
    left = jax.random.randint(k3, (), 0, jnp.maximum(F - w, 1))
    top = jax.random.randint(k4, (), 0, jnp.maximum(T - h, 1))
    value = jax.random.uniform(k5, (), minval=x.min(), maxval=x.max())
    return _fill_masked(x, _rect_mask(T, F, top, h, left, w), value, n_zero_channels)


def spec_augment_dev(key, x, n_zero_channels):
    C, T, F = x.shape
    kt1, kt2, kt3, kf1, kf2, kf3 = jax.random.split(key, 6)
    t_max = max(1, int(0.15 * T))
    f_max = max(1, int(0.2 * F))
    lo, hi = x.min(), x.max()
    dur_t = jax.random.randint(kt1, (), 1, max(t_max, 2))
    start_t = jax.random.randint(kt2, (), 0, jnp.maximum(T - dur_t, 1))
    x = _fill_masked(x, _rect_mask(T, F, start_t, dur_t, 0, F),
                     jax.random.uniform(kt3, (), minval=lo, maxval=hi), n_zero_channels)
    dur_f = jax.random.randint(kf1, (), 1, max(f_max, 2))
    start_f = jax.random.randint(kf2, (), 0, jnp.maximum(F - dur_f, 1))
    x = _fill_masked(x, _rect_mask(T, F, 0, T, start_f, dur_f),
                     jax.random.uniform(kf3, (), minval=lo, maxval=hi), n_zero_channels)
    return x


def cutout_holes_dev(key, x, n_holes, hole_size, n_zero_channels):
    C, T, F = x.shape
    lo, hi = x.min(), x.max()
    keys = jax.random.split(key, n_holes)

    def body(x, k):
        k1, k2, k3 = jax.random.split(k, 3)
        left = jax.random.randint(k1, (), 0, max(F - hole_size, 1))
        top = jax.random.randint(k2, (), 0, max(T - hole_size, 1))
        value = jax.random.uniform(k3, (), minval=lo, maxval=hi)
        return _fill_masked(x, _rect_mask(T, F, top, hole_size, left, hole_size),
                            value, n_zero_channels), None

    x, _ = jax.lax.scan(body, x, keys)
    return x


# ---------------------------------------------------------------------------
# assembled per-sample augmentation
# ---------------------------------------------------------------------------

def make_device_augment(feature_type: str, audio_format: str, n_classes: int,
                        train_chunk_len: int, n_features: int,
                        mode: str = "full"):
    """Returns fn(key, x_batch, sed_batch, doa_batch) applying the same augmentation
    wiring as data/transforms.py::build_train_transforms, fully in-graph.

    mode: "full" (reference stack — label-coupled channel swaps + feature-only
    transforms) or "feature" (frequency shift + cutout family only, no channel
    swaps) — the knob the augmentation ablation (scripts/aug_ablation.py)
    measures; the reference only ever demonstrates the full stack
    (dataset/datamodule.py:44-100)."""
    if mode not in ("full", "feature"):
        raise ValueError(f"device_augment mode must be 'full' or 'feature', "
                         f"got {mode!r}")
    aspect = train_chunk_len / n_features
    tfmap = feature_type in ("salsa", "salsa_lite", "salsa_ipd", "linspeciv",
                             "melspeciv")
    use_cutout = not (feature_type == "salsa" and audio_format == "foa")
    n_zero = 3 if tfmap else 6
    shift_last = 0 if tfmap else 6

    def one(key, x, sed, doa):
        ks = jax.random.split(key, 6)
        # joint channel swap (p=0.5)
        if mode == "feature":
            pass  # no label-coupled swaps in the feature-only ablation arm
        elif tfmap and audio_format == "foa":
            m = jax.random.bernoulli(ks[0], 0.5, (4,)).astype(jnp.float32)
            apply = jax.random.bernoulli(ks[1], 0.5)
            m = m * apply
            x, doa = swap_channel_foa_dev(x, doa, m, n_classes)
        elif tfmap:
            m = jax.random.bernoulli(ks[0], 0.5, (3,)).astype(jnp.float32)
            apply = jax.random.bernoulli(ks[1], 0.5)
            m = m * apply
            x, doa = swap_channel_mic_dev(x, doa, m, n_classes)
        else:  # gcc features
            m = jax.random.bernoulli(ks[0], 0.5, (3,)).astype(jnp.float32)
            apply = jax.random.bernoulli(ks[1], 0.5)
            m = m * apply
            x, doa = swap_channel_gcc_dev(x, doa, m, n_classes)

        # frequency shift (p=0.5)
        shift = jax.random.randint(ks[2], (), 1, 10)
        up = jax.random.bernoulli(ks[3], 0.5)
        do_shift = jax.random.bernoulli(ks[4], 0.5)
        if shift_last == 0:
            shifted = freq_shift_dev(x, shift, up, 10)
        else:
            head = freq_shift_dev(x[:-shift_last], shift, up, 10)
            shifted = jnp.concatenate([head, x[-shift_last:]], axis=0)
        x = jnp.where(do_shift, shifted, x)

        if use_cutout:
            kc, kp, kchoice = jax.random.split(ks[5], 3)
            choice = jax.random.randint(kchoice, (), 0, 3)
            cut = jax.lax.switch(
                choice,
                [
                    lambda xx: random_cutout_dev(kc, xx, aspect, n_zero),
                    lambda xx: spec_augment_dev(kc, xx, n_zero),
                    lambda xx: cutout_holes_dev(kc, xx, 8, 8, n_zero),
                ],
                x,
            )
            do_cut = jax.random.bernoulli(kp, 0.5)
            x = jnp.where(do_cut, cut, x)
        return x, sed, doa

    def batch_fn(key, x, sed, doa):
        keys = jax.random.split(key, x.shape[0])
        return jax.vmap(one)(keys, x, sed, doa)

    return batch_fn
