"""Stage-level timing of the SALSA-FOA extraction pipeline on real TPU hardware.

Times cumulative prefixes of extract_salsa's graph (each as its own jit that
reduces to one scalar) so stage costs come out by subtraction, all carrying the
same ~23 ms dispatch-transport constant:

  stft        : windowed-DFT matmul STFT (re/im planes)
  +logspec    : + power -> compression matmul -> dB
  +tracker    : + band planes + wrap pad + tracking magnitude + noise-floor scan
  full        : + Pallas spatial kernel (= bench.py's extract, minus final concat)

Also times an N=256 DFT variant (Nyquist bin via a separate VPU reduction
instead of padding the MXU matmul to 384 lanes) to size that candidate.

Run solo (CLAUDE.md TPU rules).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from salsa_tpu.dsp.stft import _windowed_dft_matrices, cabs2, frame_signal, power_to_db
from salsa_tpu.dsp.filterbank import high_freq_compression_matrix
from salsa_tpu.features.salsa import (
    SalsaParams,
    eig_features_from_planes,
    noise_floor_mask,
    tracking_magspec_planes,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    fs, n_fft, hop = 24000, 512, 300
    p = SalsaParams(fs=fs, n_fft=n_fft, hop_length=hop, fmax_doa=9000.0,
                    audio_format="foa", eig_method="pallas")
    n = int(fs * 60.0)
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    waves = 0.05 * rng.standard_normal((args.batch, 4, n)).astype(np.float32)
    waves += 0.3 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    x = jax.device_put(waves)

    W = jnp.asarray(high_freq_compression_matrix(n_fft, True))
    cos_mat, sin_mat = _windowed_dft_matrices(n_fft, n_fft)

    def stft_planes(w):
        wp = jnp.pad(w, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        frames = frame_signal(wp, n_fft, hop)
        return frames @ jnp.asarray(cos_mat), frames @ jnp.asarray(sin_mat)

    def stft_planes_256(w):
        wp = jnp.pad(w, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        frames = frame_signal(wp, n_fft, hop)
        cr, sr = jnp.asarray(cos_mat[:, :256]), jnp.asarray(sin_mat[:, :256])
        re = frames @ cr
        im = frames @ sr
        nyq = frames @ jnp.asarray(cos_mat[:, 256])  # sin col is ~0 at Nyquist
        return jnp.concatenate([re, nyq[..., None]], -1), jnp.pad(im, ((0, 0), (0, 0), (0, 1)))

    def upto_stft(w, sfn):
        re, im = sfn(w)
        return jnp.sum(re) + jnp.sum(im)

    def upto_logspec(w):
        re, im = stft_planes(w)
        log_spec = power_to_db(jnp.einsum("ctb,fb->ctf", re * re + im * im, W))
        return jnp.sum(log_spec)

    def band_planes(re, im):
        h = p.n_hopframes
        xr = jnp.transpose(re[:, :, p.lower_bin : p.upper_bin], (0, 2, 1))
        xi = jnp.transpose(im[:, :, p.lower_bin : p.upper_bin], (0, 2, 1))
        xr = jnp.concatenate([xr[:, :, -h:], xr, xr[:, :, :h]], axis=-1)
        xi = jnp.concatenate([xi[:, :, -h:], xi, xi[:, :, :h]], axis=-1)
        return xr, xi

    def upto_tracker(w):
        re, im = stft_planes(w)
        log_spec = power_to_db(jnp.einsum("ctb,fb->ctf", re * re + im * im, W))
        xr, xi = band_planes(re, im)
        mag = tracking_magspec_planes(xr[0], xi[0], p.n_hopframes, re.shape[1])
        mask = noise_floor_mask(mag)
        return jnp.sum(log_spec) + jnp.sum(mask)

    def full(w):
        re, im = stft_planes(w)
        log_spec = power_to_db(jnp.einsum("ctb,fb->ctf", re * re + im * im, W))
        xr, xi = band_planes(re, im)
        mag = tracking_magspec_planes(xr[0], xi[0], p.n_hopframes, re.shape[1])
        mask = noise_floor_mask(mag)
        eig = eig_features_from_planes(xr, xi, mask, p)
        return jnp.sum(log_spec) + jnp.sum(eig)

    cases = [
        ("stft", lambda w: upto_stft(w, stft_planes)),
        ("stft_n256", lambda w: upto_stft(w, stft_planes_256)),
        ("+logspec", upto_logspec),
        ("+tracker", upto_tracker),
        ("full", full),
    ]
    for name, case in cases:
        fn = jax.jit(lambda ws, c=case: jnp.sum(jax.vmap(c)(ws)))
        try:
            s = float(np.asarray(fn(x)))
        except Exception as e:
            print(f"{name:>12}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = float(np.asarray(fn(x)))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:>12}: {dt * 1e3:8.2f} ms/batch  sum={s:.6e}", flush=True)


if __name__ == "__main__":
    main()
