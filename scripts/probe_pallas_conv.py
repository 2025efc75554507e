"""Probe: can a VMEM-resident Pallas conv beat XLA on the stage-1 64-channel
3x3 convs? (VERDICT r3 item 7 — the last bounded perf item in BENCH.md.)

The lane math: a 64-output-channel conv fills only half of the 128-lane MXU.
The candidate trick probed here is PAIRED-POSITION packing: work in the
pair-packed layout X2 = x.reshape(B, H, W/2, 2C) (a FREE row-major reshape —
lanes = [even-col channels | odd-col channels], always full 128) and compute
both output positions (h, 2w) and (h, 2w+1) of a pair as one matmul row. The
contraction for output pair p decomposes into six full-register terms:

  for dh in -1..1:  center   = X2[h+dh, p]              (cols 2p, 2p+1)
                    combined = where(lane < 64,          (col 2p+2 | col 2p-1)
                                     X2[h+dh, p+1], X2[h+dh, p-1])

each multiplied by a (128, 128) weight block; `combined`'s block is half
structural zeros (next-even only feeds the odd output, prev-odd only the
even output), giving K=768, N=128 at 1.33x the exact FLOPs — a potential
~1.5x MXU-throughput win IF patch assembly is free. Every VMEM op is a
sublane slice, an elementwise select, or a 128-aligned lane concat — the
lane-misaligned shuffles Mosaic cannot lower never appear. Unlike the
round-2 HBM im2col probe (9x traffic, rejected), assembly happens in VMEM;
HBM traffic is the same as the native conv's.

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
    """(3, 3, C, 64) HWIO conv kernel -> (6*2C, 128) paired weight matrix.

    Row blocks (2C each, in kernel concat order): center(dh=0..2) then
    combined(dh=0..2). Column halves: [even output 2p | odd output 2p+1].
    Input column of row half r, output column of column half n:
      center rows   [0:C]  = col 2p   -> out 2p: w[dh,1]; out 2p+1: w[dh,0]
      center rows   [C:2C] = col 2p+1 -> out 2p: w[dh,2]; out 2p+1: w[dh,1]
      combined rows [0:C]  = col 2p+2 -> out 2p+1 only:   w[dh,2]
      combined rows [C:2C] = col 2p-1 -> out 2p   only:   w[dh,0]
    """
    C = w.shape[2]
    blocks = []
    for dh in range(3):
        c = np.zeros((2 * C, 128), w.dtype)
        c[0:C, 0:64] = w[dh, 1]
        c[0:C, 64:128] = w[dh, 0]
        c[C:, 0:64] = w[dh, 2]
        c[C:, 64:128] = w[dh, 1]
        blocks.append(c)
    for dh in range(3):
        n = np.zeros((2 * C, 128), w.dtype)
        n[0:C, 64:128] = w[dh, 2]
        n[C:, 0:64] = w[dh, 0]
        blocks.append(n)
    return jnp.asarray(np.concatenate(blocks, axis=0), dtype)


def paired_conv_pallas(x, w_big, bh: int, interpret: bool = False):
    """NHWC 3x3 SAME conv, 64 output channels, via paired-position packing.

    x: (B, H, W, C) with W even; w_big: (6*2C, 128) from make_w_big.
    Grid (B, H/bh). Each program reads its bh-row stripe of the pair-packed
    X2 = x.reshape(B, H, W/2, 2C) plus two single-row halo blocks (height-1
    BlockSpecs are block-aligned at any row, so no overlapping-window
    materialization in HBM), zero-pads the pair axis in VMEM, assembles the
    six full-register tap slices per pair, and runs one K=768 full-128-lane
    dot_general.
    """
    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    assert H % bh == 0 and W % 2 == 0
    nH, P, C2 = H // bh, W // 2, 2 * C
    x2 = x.reshape(B, H, P, C2)  # free: row-major (W, C) IS (W/2, 2C)

    def kernel(up_ref, x_ref, dn_ref, w_ref, o_ref):
        i = pl.program_id(1)
        up = jnp.where(i == 0, 0.0, up_ref[0]).astype(x_ref.dtype)
        dn = jnp.where(i == nH - 1, 0.0, dn_ref[0]).astype(x_ref.dtype)
        blk = jnp.concatenate([up, x_ref[0], dn], axis=0)  # (bh+2, P, 2C)
        blk = jnp.pad(blk, ((0, 0), (1, 1), (0, 0)))       # pair-edge zeros
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C2), 2)
        pieces = []
        for dh in range(3):
            pieces.append(blk[dh : dh + bh, 1 : P + 1])     # center pair
        for dh in range(3):
            nxt = blk[dh : dh + bh, 2 : P + 2]              # col 2p+2 in 0:C
            prv = blk[dh : dh + bh, 0:P]                    # col 2p-1 in C:2C
            pieces.append(jnp.where(lane < C, nxt, prv))
        # six accumulated K=2C dots (dh-shifted slices carry different sublane
        # offsets, which Mosaic's lane concat refuses to merge)
        out = jnp.zeros((bh, P, 128), jnp.float32)
        for t, piece in enumerate(pieces):
            out += jax.lax.dot_general(
                piece, w_ref[t * C2 : (t + 1) * C2],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (bh, P, 128)
        o_ref[0] = out.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            # row above the stripe (clamped at the top; masked in-kernel)
            pl.BlockSpec((1, 1, P, C2),
                         lambda b, i: (b, jnp.maximum(i * bh - 1, 0), 0, 0)),
            pl.BlockSpec((1, bh, P, C2), lambda b, i: (b, i, 0, 0)),
            # row below the stripe (clamped at the bottom; masked in-kernel)
            pl.BlockSpec((1, 1, P, C2),
                         lambda b, i: (b, jnp.minimum((i + 1) * bh, H - 1),
                                       0, 0)),
            pl.BlockSpec((6 * C2, 128), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, P, 128), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, P, 128), x.dtype),
        interpret=interpret,
    )(x2, x2, x2, w_big)
    # unpair: (W/2, 128) row-major IS (W, 64) — a free reshape outside the kernel
    return out.reshape(B, H, W, 64)


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
