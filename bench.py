"""Headline benchmark: SALSA-FOA feature extraction throughput on one chip.

The reference's SALSA extractor is its hottest path: a Python double loop with a 4x4
SVD per TF bin, ~9.3 s per 60 s clip on CPU (= 6.45x realtime; SALSA-Lite paper,
BASELINE.md). Here the whole extractor is one jit graph (scan noise tracker + batched
windowed covariance + batched power-iteration eigenpair), so the figure of merit is
audio-seconds processed per wall-second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_XRT = 6.45  # reference SALSA extraction, 9.3 s per 60 s clip (CPU)


def main():
    import jax

    # persistent compile cache: repeated bench runs skip the (slow, remote) compile
    try:
        import os
        os.makedirs("/tmp/salsa_tpu_jit_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/salsa_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from functools import partial

    from salsa_tpu.features.salsa import SalsaParams, extract_salsa

    fs = 24000
    clip_seconds = 60.0
    n_samples = int(fs * clip_seconds)
    batch = 64  # clips per device dispatch — per-chip THROUGHPUT figure
    # (batch 8 reported 10.8k x in r01, 32 gave 24.5k x in r03; the fixed
    # dispatch+transport cost keeps amortizing: 64 -> 29.6k x, 128 -> 30.3k x
    # (scripts/probe_stft_split.py sweep) — 64 is the knee at half the footprint)

    eig_method = "pallas" if jax.default_backend() != "cpu" else "power"
    params = SalsaParams(fs=fs, n_fft=512, hop_length=300, fmax_doa=9000.0,
                         audio_format="foa", eig_method=eig_method)

    # NOTE on timing: through some PJRT transports block_until_ready is not a
    # reliable fence, so each timed call reduces the full feature tensor to one
    # scalar and fetches it to host — the checksum forces every value to be
    # computed while keeping transfer out of the measurement.
    @partial(jax.jit)
    def extract_batch_checksum(waves):
        feats = jax.vmap(lambda w: extract_salsa(w, params))(waves)
        return jnp.sum(feats)

    rng = np.random.default_rng(0)
    t = np.arange(n_samples) / fs
    waves = 0.05 * rng.standard_normal((batch, 4, n_samples)).astype(np.float32)
    waves += 0.3 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    x = jax.device_put(waves)
    try:
        checksum = float(np.asarray(extract_batch_checksum(x)))  # compile + warm up
    except Exception:
        # fall back to the pure-XLA eigensolver if the Pallas kernel cannot compile
        # on this backend
        params = SalsaParams(fs=fs, n_fft=512, hop_length=300, fmax_doa=9000.0,
                             audio_format="foa", eig_method="power")

        @partial(jax.jit)
        def extract_batch_checksum(waves):  # noqa: F811
            feats = jax.vmap(lambda w: extract_salsa(w, params))(waves)
            return jnp.sum(feats)

        checksum = float(np.asarray(extract_batch_checksum(x)))
    assert np.isfinite(checksum)

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        s = float(np.asarray(extract_batch_checksum(x)))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)

    xrt = clip_seconds * batch * n_iters / dt
    print(json.dumps({
        "metric": "salsa_foa_extraction_throughput",
        "value": round(xrt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / BASELINE_XRT, 1),
    }))


if __name__ == "__main__":
    main()
