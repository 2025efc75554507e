"""Benchmark every feature type's extraction throughput on the current device.

    python scripts/bench_features.py [--batch 8] [--seconds 60]

Prints one JSON line per feature type with x-realtime throughput.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CASES = [
    ("salsa", "foa"),
    ("salsa", "mic"),
    ("salsa_lite", "mic"),
    ("salsa_ipd", "mic"),
    ("linspeciv", "foa"),
    ("melspeciv", "foa"),
    ("linspecgcc", "mic"),
    ("melspecgcc", "mic"),
    ("melspec", "foa"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/salsa_tpu_jit_cache")
    from salsa_tpu.features.registry import make_extractor

    fs = 24000
    n = int(fs * args.seconds)
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    waves = 0.05 * rng.standard_normal((args.batch, 4, n)).astype(np.float32)
    waves += 0.3 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    x = jax.device_put(waves)

    for ft, fmt in CASES:
        if args.only and ft != args.only:
            continue
        ex = make_extractor(ft, fmt, fs=fs, n_fft=512, hop_length=300, jit=False)
        g = jax.jit(lambda w, fn=ex.fn: jnp.sum(jax.vmap(fn)(w)))
        try:
            float(np.asarray(g(x)))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s = float(np.asarray(g(x)))
            dt = time.perf_counter() - t0
            xrt = args.seconds * args.batch * args.iters / dt
            print(json.dumps({
                "feature": ft, "format": fmt,
                "ms_per_clip": round(dt / (args.iters * args.batch) * 1000, 2),
                "x_realtime": round(xrt, 0),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"feature": ft, "format": fmt,
                              "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
