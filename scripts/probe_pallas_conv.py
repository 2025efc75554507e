"""Probe: can a VMEM-resident Pallas conv beat XLA on the stage-1 64-channel
3x3 convs? (VERDICT r3 item 7 — the last bounded perf item in BENCH.md.)

The lane math: a 64-output-channel conv fills only half of the 128-lane MXU.
The candidate trick probed here is PAIRED-POSITION output packing: one matmul
row computes BOTH output positions (h, 2w) and (h, 2w+1) from their shared
3x4-tap window, against a block-structured weight matrix

    W_big (12*64, 128):  W_big[(dh,dw), :,   0: 64] = W[dh, dw]   (dw 0..2)
                         W_big[(dh,dw), :,  64:128] = W[dh, dw-1] (dw 1..3)

so the MXU sees K=768, N=128 (full lanes) at 1.33x the exact FLOPs — a
potential ~1.5x MXU-throughput win IF patch assembly is free. Unlike the
round-2 HBM im2col probe (9x traffic, rejected), assembly here happens in
VMEM inside the kernel; HBM traffic is the same as the native conv's.

Run on the TPU:  python scripts/probe_pallas_conv.py
CPU numerics check:  python scripts/probe_pallas_conv.py --check-only
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/salsa_tpu_jit_cache")

import jax
import jax.numpy as jnp


def make_w_big(w, dtype):
    """(3, 3, C, 64) conv kernel -> (12, C, 128) paired weight tensor."""
    C = w.shape[2]
    w_big = np.zeros((3, 4, C, 128), w.dtype)
    w_big[:, 0:3, :, 0:64] = w          # taps for the even (left) position
    w_big[:, 1:4, :, 64:128] = w        # taps for the odd (right) position
    return jnp.asarray(w_big.reshape(12, C, 128), dtype)


def paired_conv_pallas(x, w_big, bh: int, interpret: bool = False):
    """NHWC 3x3 SAME conv, 64 output channels, via paired-position packing.

    x: (B, H, W, C) with W even; w_big: (12, C, 128) from make_w_big.
    Grid (B, H/bh). Each program reads its bh-row stripe plus two single-row
    halo blocks (height-1 BlockSpecs are block-aligned at any row, so no
    overlapping-window materialization in HBM), zero-pads the W edges in
    VMEM, assembles the (bh, W/2, 12, C) shared-window patches, and runs one
    full-128-lane dot_general.
    """
    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    assert H % bh == 0 and W % 2 == 0
    nH = H // bh

    def kernel(up_ref, x_ref, dn_ref, w_ref, o_ref):
        i = pl.program_id(1)
        up = jnp.where(i == 0, 0.0, up_ref[0]).astype(x_ref.dtype)
        dn = jnp.where(i == nH - 1, 0.0, dn_ref[0]).astype(x_ref.dtype)
        blk = jnp.concatenate([up, x_ref[0], dn], axis=0)  # (bh+2, W, C)
        blk = jnp.pad(blk, ((0, 0), (1, 1), (0, 0)))       # W-edge zeros, VMEM
        xr = blk.reshape(bh + 2, (W + 2) // 2, 2, C)       # even/odd columns
        taps4 = jnp.concatenate(
            [xr[:, : W // 2], xr[:, 1 : W // 2 + 1]], axis=2
        )                                                  # (bh+2, W/2, 4, C)
        taps12 = jnp.concatenate(
            [taps4[0:bh], taps4[1 : bh + 1], taps4[2 : bh + 2]], axis=2
        )                                                  # (bh, W/2, 12, C)
        out = jax.lax.dot_general(
            taps12, w_ref[...],
            dimension_numbers=(((2, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (bh, W/2, 128)
        o_ref[0] = out.reshape(bh, W, 64).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            # row above the stripe (clamped at the top; masked in-kernel)
            pl.BlockSpec((1, 1, W, C),
                         lambda b, i: (b, jnp.maximum(i * bh - 1, 0), 0, 0)),
            pl.BlockSpec((1, bh, W, C), lambda b, i: (b, i, 0, 0)),
            # row below the stripe (clamped at the bottom; masked in-kernel)
            pl.BlockSpec((1, 1, W, C),
                         lambda b, i: (b, jnp.minimum((i + 1) * bh, H - 1),
                                       0, 0)),
            pl.BlockSpec((12, C, 128), lambda b, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, W, 64), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 64), x.dtype),
        interpret=interpret,
    )(x, x, x, w_big)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def fetch_scalar(x):
    """Reliable device fence on the axon harness (CLAUDE.md)."""
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def bench(fn, *args, iters=30):
    out = fn(*args)
    fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_scalar(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true",
                    help="CPU interpret-mode numerics check, no timing")
    ap.add_argument("--bh", type=int, default=16, help="rows per grid block")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.check_only:
        jax.config.update("jax_platforms", "cpu")
        B, H, W, C = 2, 8, 10, 64
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        w = rng.standard_normal((3, 3, C, 64)).astype(np.float32)
        got = paired_conv_pallas(x, make_w_big(w, jnp.float32), bh=4,
                                 interpret=True)
        want = xla_conv(x, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
        print("numerics OK (interpret mode)")
        return

    print("devices:", jax.devices(), flush=True)
    # stage-1 geometry of the flagship from_wav step (chunk 8 s, fs 24 kHz,
    # hop 300 -> T=640, F=200; after the stem's 2x2 pool: 320 x 100)
    B, H, W, C = args.batch, 320, 100, 64
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    w = rng.standard_normal((3, 3, C, 64)).astype(np.float32) * 0.05
    wj = jnp.asarray(w, dt)
    w_big = make_w_big(w, dt)

    f_xla = jax.jit(xla_conv)
    f_pal = jax.jit(functools.partial(paired_conv_pallas, bh=args.bh))

    # numerics on hardware first
    got = np.asarray(f_pal(x, w_big), np.float32)
    want = np.asarray(f_xla(x, wj), np.float32)
    err = np.abs(got - want).max() / max(1e-6, np.abs(want).max())
    print(f"max rel err vs XLA conv: {err:.2e}")

    t_xla = bench(f_xla, x, wj)
    t_pal = bench(f_pal, x, w_big)
    flops = 2 * B * H * W * 9 * C * 64
    print(f"XLA conv:    {t_xla*1e3:7.3f} ms  ({flops/t_xla/1e12:6.1f} TF/s effective)")
    print(f"pallas pair: {t_pal*1e3:7.3f} ms  ({flops/t_pal/1e12:6.1f} TF/s effective, "
          f"{flops*4/3/t_pal/1e12:6.1f} TF/s raw incl. structural zeros)")
    print(f"speedup: {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
