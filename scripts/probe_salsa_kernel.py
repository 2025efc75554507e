"""Probe the Pallas SALSA spatial kernel's cost structure on real TPU hardware.

Times parameterized variants of the fused cov+eig kernel (same tiling/DMA layout as
salsa_tpu/features/salsa_pallas.py) to locate where the 55 ms/batch goes:

  - full            : current production numerics (baseline)
  - cov_only        : windowed covariance + writeout, no eigensolver
  - no_second       : skip the 3-iteration second-eigenpair loop (lam1 = 0)
  - prodslide       : covariance from per-pair product arrays + shifted adds
                      (each complex product computed once instead of win times)
  - realdiag        : prodslide + real-diagonal algebra in cov and matsquare
  - sq{1,2,4}       : N_SQUARINGS sweep (production = 3)
  - tile TxB        : T_TILE / BIN_TILE sweep at production numerics

Timing fences on fetching a checksum scalar (CLAUDE.md TPU rules). Run solo.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from salsa_tpu.features.salsa_pallas import (
    C,
    _Cplx,
    _matvec,
    _start_vectors,
    _trace,
)
from salsa_tpu.dsp.stft import frame_signal

N_SQUARINGS = 3


def _matsquare_v(H, realdiag: bool):
    out = {}
    for i in range(C):
        for j in range(i, C):
            if realdiag and i == j:
                # P²[i,i] = Σ_k |p_ik|² — real by Hermitian symmetry
                acc = None
                for k in range(C):
                    hik = H[(i, k)] if i <= k else H[(k, i)]
                    term = hik.re * hik.re + hik.im * hik.im
                    acc = term if acc is None else acc + term
                out[(i, j)] = _Cplx(acc, jnp.zeros_like(acc))
            else:
                acc = None
                for k in range(C):
                    hik = H[(i, k)] if i <= k else H[(k, i)].conj()
                    hkj = H[(k, j)] if k <= j else H[(j, k)].conj()
                    term = hik * hkj
                    acc = term if acc is None else acc + term
                out[(i, j)] = acc
    return out


def make_kernel(variant: str, n_sq: int, bin_tile: int, t_tile: int):
    def _kernel(xr_ref, xi_ref, mask_ref, out_ref, *, n_hop, condition_number):
        win = 2 * n_hop + 1
        x = [_Cplx(xr_ref[c, 0, :, :], xi_ref[c, 0, :, :]) for c in range(C)]
        inv_win = 1.0 / win

        if variant == "prep_only":
            # measures grid+DMA+writeout with no math: out = first 3 channels' re
            valid = mask_ref[:, :] > 0.5
            zero = jnp.zeros((bin_tile, t_tile), jnp.float32)
            for cix in range(C - 1):
                out_ref[cix, :, :] = jnp.where(
                    valid, x[cix].re[:, 0:t_tile], zero)
            return

        R = {}
        if variant in ("prodslide", "realdiag"):
            for i in range(C):
                for j in range(i, C):
                    a = x[i]
                    b = x[j]
                    if variant == "realdiag" and i == j:
                        p = _Cplx(a.re * a.re + a.im * a.im, None)
                        acc = None
                        for k in range(win):
                            s = p.re[:, k : k + t_tile]
                            acc = s if acc is None else acc + s
                        R[(i, j)] = _Cplx(acc * inv_win,
                                          jnp.zeros((bin_tile, t_tile), jnp.float32))
                    else:
                        p = a * b.conj()
                        accr = acci = None
                        for k in range(win):
                            sr = p.re[:, k : k + t_tile]
                            si = p.im[:, k : k + t_tile]
                            accr = sr if accr is None else accr + sr
                            acci = si if acci is None else acci + si
                        R[(i, j)] = _Cplx(accr * inv_win, acci * inv_win)
        else:
            for i in range(C):
                for j in range(i, C):
                    acc = None
                    for k in range(win):
                        a = _Cplx(x[i].re[:, k : k + t_tile], x[i].im[:, k : k + t_tile])
                        bb = _Cplx(x[j].re[:, k : k + t_tile], x[j].im[:, k : k + t_tile])
                        p = a * bb.conj()
                        acc = p if acc is None else acc + p
                    R[(i, j)] = acc.scale(inv_win)

        if variant == "cov_only":
            valid = mask_ref[:, :] > 0.5
            zero = jnp.zeros((bin_tile, t_tile), jnp.float32)
            for cix in range(C - 1):
                out_ref[cix, :, :] = jnp.where(valid, R[(0, cix + 1)].re, zero)
            return

        inv_tr = 1.0 / (_trace(R) + 1e-30)
        Rn = {ij: R[ij].scale(inv_tr) for ij in R}
        P = Rn
        realdiag = variant == "realdiag"
        for _ in range(n_sq):
            P = _matsquare_v(P, realdiag)
            inv_ptr = 1.0 / (_trace(P) + 1e-30)
            P = {ij: P[ij].scale(inv_ptr) for ij in P}

        s0, s1 = _start_vectors()

        def const_vec(s):
            return [
                _Cplx(jnp.full((bin_tile, t_tile), np.float32(s[c].real)),
                      jnp.full((bin_tile, t_tile), np.float32(s[c].imag)))
                for c in range(C)
            ]

        def normalize(v):
            nrm2 = sum(v[c].re * v[c].re + v[c].im * v[c].im for c in range(C))
            inv = jax.lax.rsqrt(nrm2 + 1e-30)
            return [vc.scale(inv) for vc in v]

        def rayleigh(H, v):
            Hv = _matvec(H, v)
            return sum(v[c].re * Hv[c].re + v[c].im * Hv[c].im for c in range(C))

        def orth(u, v):
            dr = sum(v[c].re * u[c].re + v[c].im * u[c].im for c in range(C))
            di = sum(v[c].re * u[c].im - v[c].im * u[c].re for c in range(C))
            return [u[c] - _Cplx(dr * v[c].re - di * v[c].im,
                                 dr * v[c].im + di * v[c].re) for c in range(C)]

        v = normalize(_matvec(P, const_vec(s0)))
        v = normalize(_matvec(P, v))
        lam0 = rayleigh(R, v)

        if variant == "no_second":
            lam1 = jnp.zeros((bin_tile, t_tile), jnp.float32)
        else:
            u = orth(const_vec(s1), v)
            for _ in range(3):
                u = _matvec(Rn, u)
                u = orth(u, v)
                u = normalize(u)
            lam1 = rayleigh(R, u)

        coherent = lam0 > lam1 * condition_number
        valid = jnp.logical_and(mask_ref[:, :] > 0.5, coherent)

        inv_v0 = 1.0 / (v[0].re * v[0].re + v[0].im * v[0].im + 1e-30)
        comps = [
            (v[cix].re * v[0].re + v[cix].im * v[0].im) * inv_v0
            for cix in range(1, C)
        ]
        nrm = jax.lax.rsqrt(sum(r * r for r in comps) + 1e-30)
        feats = [r * nrm for r in comps]

        zero = jnp.zeros((bin_tile, t_tile), jnp.float32)
        for cix in range(C - 1):
            out_ref[cix, :, :] = jnp.where(valid, feats[cix], zero)

    return _kernel


@functools.partial(jax.jit, static_argnames=("variant", "n_sq", "bin_tile", "t_tile",
                                             "halo", "n_hop"))
def run_variant(X, sig_mask, *, variant, n_sq, bin_tile, t_tile, halo, n_hop=3):
    n_bins, n_frames = X.shape[0], X.shape[1]
    Xpad = jnp.concatenate([X[:, -n_hop:], X, X[:, :n_hop]], axis=1)
    bins_pad = -(-n_bins // bin_tile) * bin_tile
    t_pad = -(-n_frames // t_tile) * t_tile
    Xpad = jnp.pad(
        Xpad, ((0, bins_pad - n_bins), (0, t_pad + halo - (n_frames + 2 * n_hop)), (0, 0)))
    mask = jnp.pad(sig_mask.astype(jnp.float32),
                   ((0, bins_pad - n_bins), (0, t_pad - n_frames)))
    n_t_blocks = t_pad // t_tile
    xr = frame_signal(jnp.transpose(jnp.real(Xpad), (2, 0, 1)), t_tile + halo, t_tile)
    xi = frame_signal(jnp.transpose(jnp.imag(Xpad), (2, 0, 1)), t_tile + halo, t_tile)
    xr = jnp.transpose(xr, (0, 2, 1, 3))
    xi = jnp.transpose(xi, (0, 2, 1, 3))

    grid = (bins_pad // bin_tile, n_t_blocks)
    out = pl.pallas_call(
        functools.partial(make_kernel(variant, n_sq, bin_tile, t_tile),
                          n_hop=n_hop, condition_number=5.0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, 1, bin_tile, t_tile + halo), lambda b, t: (0, t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, bin_tile, t_tile + halo), lambda b, t: (0, t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_tile, t_tile), lambda b, t: (b, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C - 1, bin_tile, t_tile), lambda b, t: (0, b, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C - 1, bins_pad, t_pad), jnp.float32),
    )(xr, xi, mask)
    return jnp.sum(out[:, :n_bins, :n_frames])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    print("devices:", jax.devices())
    n_bins, n_frames = 191, 4801
    rng = np.random.default_rng(0)
    # NOTE: the axon transport cannot device_put complex64 (wedges the session);
    # ship f32 re/im planes and lax.complex them on device.
    Xre = rng.standard_normal((args.batch, n_bins, n_frames, C)).astype(np.float32)
    Xim = rng.standard_normal((args.batch, n_bins, n_frames, C)).astype(np.float32)
    maskf = (rng.standard_normal((args.batch, n_bins, n_frames)) > 0.2
             ).astype(np.float32)
    Xred = jax.device_put(Xre)
    Ximd = jax.device_put(Xim)
    mfd = jax.device_put(maskf)

    configs = [
        ("full", dict(variant="full", n_sq=3, bin_tile=8, t_tile=512, halo=128)),
    ]

    # production planes entry (v2 dual-ref halo layout) + tile sweep: planes are
    # pre-built in (C, bins, T+2h) so these time pad + pallas_call only
    import salsa_tpu.features.salsa_pallas as sp

    n_hop = 3
    XreP = np.concatenate([Xre[:, :, -n_hop:], Xre, Xre[:, :, :n_hop]], axis=2)
    XimP = np.concatenate([Xim[:, :, -n_hop:], Xim, Xim[:, :, :n_hop]], axis=2)
    XreP = np.ascontiguousarray(np.transpose(XreP, (0, 3, 1, 2)))  # (B,C,bins,T+2h)
    XimP = np.ascontiguousarray(np.transpose(XimP, (0, 3, 1, 2)))
    XrePd = jax.device_put(XreP)
    XimPd = jax.device_put(XimP)

    def planes_fn(bt, tt):
        def f(xr, xi, m):
            sp.BIN_TILE, sp.T_TILE = bt, tt
            return jnp.sum(sp.salsa_spatial_pallas_planes.__wrapped__(
                xr, xi, m > 0.5))
        return f

    extra = [(f"planes_{bt}x{tt}", planes_fn(bt, tt), True)
             for bt, tt in ((8, 512), (16, 512), (32, 512), (8, 1024), (16, 1024),
                            (64, 512), (8, 2048))]
    extra += [("planes_prep", lambda xr, xi, m: jnp.sum(
        jnp.pad(xr, ((0, 0), (0, 1), (0, 441))) +
        jnp.pad(xi, ((0, 0), (0, 1), (0, 441)))), True)]

    fullsum = None
    for name, fnv, nock in extra:
        fn = jax.jit(jax.vmap(fnv))
        try:
            s = float(np.asarray(jnp.sum(fn(XrePd, XimPd, mfd))))
        except Exception as e:
            print(f"{name:>16}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = float(np.asarray(jnp.sum(fn(XrePd, XimPd, mfd))))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:>16}: {dt * 1e3:8.2f} ms/batch  sum={s:.6e}", flush=True)

    for name, kw in configs:
        fn = jax.jit(jax.vmap(
            lambda xre, xim, m: run_variant(jax.lax.complex(xre, xim), m > 0.5, **kw)))
        try:
            s = float(np.asarray(jnp.sum(fn(Xred, Ximd, mfd))))  # compile+warm
        except Exception as e:
            print(f"{name:>16}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = float(np.asarray(jnp.sum(fn(Xred, Ximd, mfd))))
        dt = (time.perf_counter() - t0) / args.iters
        if name == "full":
            fullsum = s
        drift = "" if fullsum is None or name in ("cov_only",) else \
            f"  checksum_rel={abs(s - fullsum) / (abs(fullsum) + 1e-30):.2e}"
        print(f"{name:>16}: {dt * 1e3:8.2f} ms/batch{drift}", flush=True)


if __name__ == "__main__":
    main()
