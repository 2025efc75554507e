"""Probe: split-matmul STFT for SALSA extraction (no frames materialization).

The current STFT materializes overlapping frames (B,4,4801,600-wide concat) in
HBM before the windowed-DFT matmul — ~2.7 GB of traffic per batch-32 pass that
exists only to feed the MXU. Because hop=300 and n_fft=512 span r=2 hop rows,
frame t = rows[t] ++ rows[t+1][:212], so the DFT splits into two matmuls over
the contiguous rows view:

    re = rows[:T] @ C[:300] + rows[1:T+1, :212] @ C[300:512]

with zero frame materialization. A second variant emits the eigensolver band
planes (C, bins_band, T) directly from the DFT (transposed matmul), skipping
the separate band-transpose pass.

Cases timed (each fetches one checksum scalar; ~23 ms transport included):
  stft_cur      current frame_signal + matmul (planes)
  stft_split    split-matmul planes
  prep_cur      logspec + padded band planes + tracker mask (current)
  prep_split    same outputs from split matmuls (band planes direct)
  full_cur      extract_salsa as shipped (Pallas kernel)
  full_split    split-STFT prep + same Pallas kernel
  full_cur_b64  shipped extract at batch 64 (transport amortization)

Also prints max-abs numeric deltas split vs current (expect f32 rounding-level
from the changed summation order, nothing more).

Run solo (CLAUDE.md TPU rules).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/salsa_tpu_jit_cache")

import jax
import jax.numpy as jnp

from salsa_tpu.dsp.stft import (
    _windowed_dft_matrices,
    frame_signal,
    power_to_db,
)
from salsa_tpu.dsp.filterbank import high_freq_compression_matrix
from salsa_tpu.features.salsa import (
    SalsaParams,
    eig_features_from_planes,
    extract_salsa,
    noise_floor_mask,
    tracking_magspec_planes,
)

FS, N_FFT, HOP = 24000, 512, 300


def make_waves(batch: int, seconds: float = 60.0) -> np.ndarray:
    n = int(FS * seconds)
    rng = np.random.default_rng(0)
    t = np.arange(n) / FS
    waves = 0.05 * rng.standard_normal((batch, 4, n)).astype(np.float32)
    waves += 0.3 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    return waves


def stft_planes_cur(w):
    wp = jnp.pad(w, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    frames = frame_signal(wp, N_FFT, HOP)
    cos_mat, sin_mat = _windowed_dft_matrices(N_FFT, N_FFT)
    return frames @ jnp.asarray(cos_mat), frames @ jnp.asarray(sin_mat)


def _rows(w):
    """(C, S) padded wave -> (C, n_rows, HOP) contiguous rows + frame count."""
    wp = jnp.pad(w, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    n_frames = 1 + (wp.shape[-1] - N_FFT) // HOP
    n_rows = n_frames + 1  # r=2: frame t spans rows t, t+1
    need = n_rows * HOP
    if need > wp.shape[-1]:
        wp = jnp.pad(wp, ((0, 0), (0, need - wp.shape[-1])))
    else:
        wp = wp[:, :need]
    return wp.reshape(wp.shape[0], n_rows, HOP), n_frames


def stft_planes_split(w):
    rows, T = _rows(w)
    cos_mat, sin_mat = _windowed_dft_matrices(N_FFT, N_FFT)
    c0, c1 = jnp.asarray(cos_mat[:HOP]), jnp.asarray(cos_mat[HOP:])
    s0, s1 = jnp.asarray(sin_mat[:HOP]), jnp.asarray(sin_mat[HOP:])
    A = rows[:, :T, :]                       # (C, T, 300)
    B = rows[:, 1 : T + 1, : N_FFT - HOP]    # (C, T, 212)
    re = A @ c0 + B @ c1
    im = A @ s0 + B @ s1
    return re, im


def band_planes_split(w, lower, upper, h):
    """(C, bins_band, T+2h) re/im planes straight from split matmuls."""
    rows, T = _rows(w)
    cos_mat, sin_mat = _windowed_dft_matrices(N_FFT, N_FFT)
    c0b = jnp.asarray(cos_mat[:HOP, lower:upper])
    c1b = jnp.asarray(cos_mat[HOP:, lower:upper])
    s0b = jnp.asarray(sin_mat[:HOP, lower:upper])
    s1b = jnp.asarray(sin_mat[HOP:, lower:upper])
    A = rows[:, :T, :]
    B = rows[:, 1 : T + 1, : N_FFT - HOP]

    def bandmm(x, m):  # (C,T,S) @ (S,K) -> (C,K,T)
        return jnp.einsum("cts,sk->ckt", x, m)

    xr = bandmm(A, c0b) + bandmm(B, c1b)
    xi = bandmm(A, s0b) + bandmm(B, s1b)
    xr = jnp.concatenate([xr[:, :, -h:], xr, xr[:, :, :h]], axis=-1)
    xi = jnp.concatenate([xi[:, :, -h:], xi, xi[:, :, :h]], axis=-1)
    return xr, xi, T


def prep_cur(w, p, W):
    re, im = stft_planes_cur(w)
    log_spec = power_to_db(jnp.einsum("ctb,fb->ctf", re * re + im * im, W))
    h = p.n_hopframes
    xr = jnp.transpose(re[:, :, p.lower_bin : p.upper_bin], (0, 2, 1))
    xi = jnp.transpose(im[:, :, p.lower_bin : p.upper_bin], (0, 2, 1))
    xr = jnp.concatenate([xr[:, :, -h:], xr, xr[:, :, :h]], axis=-1)
    xi = jnp.concatenate([xi[:, :, -h:], xi, xi[:, :, :h]], axis=-1)
    mag = tracking_magspec_planes(xr[0], xi[0], h, re.shape[1])
    mask = noise_floor_mask(mag)
    return log_spec, xr, xi, mask


def prep_split(w, p, W):
    re, im = stft_planes_split(w)
    log_spec = power_to_db(jnp.einsum("ctb,fb->ctf", re * re + im * im, W))
    xr, xi, T = band_planes_split(w, p.lower_bin, p.upper_bin, p.n_hopframes)
    mag = tracking_magspec_planes(xr[0], xi[0], p.n_hopframes, T)
    mask = noise_floor_mask(mag)
    return log_spec, xr, xi, mask


def full_with_prep(w, p, W, prep):
    log_spec, xr, xi, mask = prep(w, p, W)
    eig = eig_features_from_planes(xr, xi, mask, p)
    return jnp.sum(log_spec) + jnp.sum(eig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    p = SalsaParams(fs=FS, n_fft=N_FFT, hop_length=HOP, fmax_doa=9000.0,
                    audio_format="foa",
                    eig_method="pallas" if jax.default_backend() != "cpu" else "power")
    W = jnp.asarray(high_freq_compression_matrix(N_FFT, True))

    x32 = jax.device_put(make_waves(args.batch))

    # numeric deltas on one clip
    dre_fn = jax.jit(lambda w: jnp.maximum(
        jnp.max(jnp.abs(stft_planes_split(w)[0] - stft_planes_cur(w)[0])),
        jnp.max(jnp.abs(stft_planes_split(w)[1] - stft_planes_cur(w)[1]))))
    print("stft split-vs-cur max|d|:", float(np.asarray(dre_fn(x32[0]))), flush=True)
    feat_cur = jax.jit(lambda w: extract_salsa(w, p))
    def _full_feat_split(w):
        log_spec, xr, xi, mask = prep_split(w, p, W)
        eig = eig_features_from_planes(xr, xi, mask, p)
        eig = jnp.transpose(eig, (0, 2, 1))
        pad_w = p.freq_dim - (p.upper_bin - p.lower_bin)
        return jnp.concatenate([log_spec, jnp.pad(eig, ((0, 0), (0, 0), (0, pad_w)))], 0)
    feat_split = jax.jit(_full_feat_split)
    fc = np.asarray(feat_cur(x32[0]))
    fs_ = np.asarray(feat_split(x32[0]))
    print(f"features split-vs-cur max|d|: {np.max(np.abs(fc - fs_)):.3e} "
          f"(spec {np.max(np.abs(fc[:4] - fs_[:4])):.3e}, "
          f"eig {np.max(np.abs(fc[4:] - fs_[4:])):.3e})", flush=True)

    cases = [
        ("stft_cur", x32, lambda w: sum(jnp.sum(t) for t in stft_planes_cur(w))),
        ("stft_split", x32, lambda w: sum(jnp.sum(t) for t in stft_planes_split(w))),
        ("prep_cur", x32, lambda w: sum(jnp.sum(t) for t in prep_cur(w, p, W)[:3])),
        ("prep_split", x32, lambda w: sum(jnp.sum(t) for t in prep_split(w, p, W)[:3])),
        ("full_cur", x32, lambda w: full_with_prep(w, p, W, prep_cur)),
        ("full_split", x32, lambda w: full_with_prep(w, p, W, prep_split)),
    ]
    x64 = jax.device_put(make_waves(64))
    cases.append(("full_cur_b64", x64, lambda w: full_with_prep(w, p, W, prep_cur)))
    cases.append(("full_split_b64", x64, lambda w: full_with_prep(w, p, W, prep_split)))

    for name, data, case in cases:
        fn = jax.jit(lambda ws, c=case: jnp.sum(jax.vmap(c)(ws)))
        try:
            s = float(np.asarray(fn(data)))
        except Exception as e:
            print(f"{name:>16}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = float(np.asarray(fn(data)))
        dt = (time.perf_counter() - t0) / args.iters
        nb = data.shape[0]
        xrt = 60.0 * nb / dt
        print(f"{name:>16}: {dt * 1e3:8.2f} ms/batch{nb}  ({xrt:,.0f}x RT)  sum={s:.6e}",
              flush=True)


if __name__ == "__main__":
    main()
