"""Benchmark the streaming SELD pipeline on hardware: per-block latency and
single-stream realtime factor at the flagship geometry.

Simulates a live feed of a 60 s FOA clip pushed in `--push-ms` sample packets
through StreamingExtractor + StreamingSeldPipeline (SALSA features + CRNN), and
reports per-block wall times (which is the latency the serving host adds on top
of the algorithmic lookahead = block + right_context + n_hopframes frames).

Run solo on the TPU (CLAUDE.md rules); works on CPU with --cpu for a sanity run.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/salsa_tpu_jit_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--block", type=int, default=160, help="feature frames (2 s)")
    ap.add_argument("--context", type=int, default=256,
                    help="left/right context frames")
    ap.add_argument("--push-ms", type=float, default=100.0)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--encoder", default="PannResNet22TPU")
    ap.add_argument("--streams", type=int, default=1,
                    help="N synchronized streams in one fused dispatch per "
                         "block; aggregate realtime = N x per-stream rate")
    ap.add_argument("--int16", action="store_true",
                    help="push int16 PCM (on-device decode): halves the "
                         "per-block sample-window upload, the dominant cost "
                         "on transport-bound links")
    ap.add_argument("--pool", action="store_true",
                    help="dynamic-pool mode (stream_pool.py): N streams "
                         "attach staggered one block apart and detach as "
                         "their audio ends — measures the serving-pool "
                         "latency incl. the attach cost (slot seed write + "
                         "tracker re-init)")
    ap.add_argument("--realtime", action="store_true",
                    help="pace the feed at real time (packet i arrives at "
                         "i*push_ms): sample uploads then ride the stream's "
                         "own cadence and per-block latency measures the pure "
                         "serving overhead a live deployment adds; also "
                         "reports push-occupancy (capacity headroom)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from salsa_tpu.models.seld import build_model
    from salsa_tpu.streaming import StreamingExtractor, StreamingSeldPipeline

    fs, n_fft, hop = 24000, 512, 300
    print("devices:", jax.devices(), flush=True)

    eig = "power" if jax.default_backend() == "cpu" else "pallas"
    N = args.streams
    se = StreamingExtractor("salsa", "foa", fs=fs, n_fft=n_fft, hop_length=hop,
                            block_frames=args.block, eig_method=eig,
                            n_streams=N)
    model = build_model(encoder={"name": args.encoder, "n_input_channels": 7},
                        decoder={"name": "SeldDecoder"}, n_classes=12)
    F = se.params.freq_dim
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 7, 64, F), jnp.float32), train=False)
    mean = np.zeros((4, 1, F), np.float32)
    std = np.ones((4, 1, F), np.float32)
    pipe = StreamingSeldPipeline(se, model, variables, (mean, std),
                                 interp_ratio=2.0, n_classes=12,
                                 left_context=args.context,
                                 right_context=args.context)

    n = int(args.seconds * fs)
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    wave = (0.05 * rng.standard_normal((N, 4, n))).astype(np.float32)
    wave += (0.3 * np.sin(2 * np.pi * (440.0 + 30 * np.arange(N))[:, None]
                          * t[None, :])).astype(np.float32)[:, None, :]
    if N == 1:
        wave = wave[0]
    if args.int16:
        wave = np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)

    push = int(args.push_ms * fs / 1000)

    if args.pool:
        from salsa_tpu.stream_pool import SeldStreamPool

        pwave = wave if wave.ndim == 3 else wave[None]
        stagger = max(1, int(round(args.block * hop / push)))

        def drive(limit):
            pipe.reset()
            pool = SeldStreamPool(pipe)
            handles, pos = [None] * N, [0] * N
            done, lat, r = [False] * N, [], 0
            while not all(done):
                t0 = time.perf_counter()
                for s in range(N):
                    if handles[s] is None and r >= s * stagger:
                        handles[s] = pool.attach()
                    if handles[s] is None or done[s]:
                        continue
                    seg = pwave[s][..., pos[s] : pos[s] + push]
                    if seg.shape[-1]:
                        pool.push(handles[s], seg)
                        pos[s] += push
                    if pos[s] >= limit:
                        pool.detach(handles[s])
                        done[s] = True
                lat.append(time.perf_counter() - t0)
                r += 1
            return np.array(lat)

        warm_len = min(n, (N * stagger + 6) * push
                       + (args.block + 2 * args.context) * hop)
        drive(warm_len)  # compile every graph incl. the attach re-init path
        print("warmed up", flush=True)
        t_start = time.perf_counter()
        lat_ms = drive(n) * 1e3
        wall = time.perf_counter() - t_start
        print(f"pool: {N} slots, attach staggered {stagger} pushes apart, "
              f"{args.seconds:.0f}s each: wall {wall:.2f}s "
              f"({N * args.seconds / wall:.1f}x aggregate realtime)")
        print(f"per-round latency ms (all live streams, one fused dispatch "
              f"per block): p50 {np.percentile(lat_ms, 50):.1f} "
              f"p95 {np.percentile(lat_ms, 95):.1f} max {lat_ms.max():.1f}")
        return

    # warm up compiles (extractor init + block fn + model window), then reset
    i = 0
    while i < 4 * push + (args.block + 2 * args.context) * hop:
        pipe.push(wave[..., i : i + push])
        i += push
    pipe.reset()
    print("warmed up", flush=True)

    lat, i, n_out, busy = [], 0, 0, 0.0
    t_start = time.perf_counter()
    while i < n:
        if args.realtime:  # packet deadline: its last sample has "arrived"
            due = t_start + (i + push) / fs
            now = time.perf_counter()
            if now < due:
                time.sleep(due - now)
        t0 = time.perf_counter()
        outs = pipe.push(wave[..., i : i + push])
        dt = time.perf_counter() - t0
        busy += dt
        if outs:
            lat.append(dt)
            n_out += sum(o[0].shape[-2] for o in outs)
        i += push
    t0 = time.perf_counter()
    outs = pipe.flush()
    lat.append(time.perf_counter() - t0)
    busy += lat[-1]
    n_out += sum(o[0].shape[-2] for o in outs)
    wall = time.perf_counter() - t_start

    lat_ms = np.array(lat) * 1e3
    algo_ms = (args.block + args.context + se.latency_frames) * hop / fs * 1e3
    print(f"{N} stream(s) x {args.seconds:.0f}s: {n_out} label frames/stream, "
          f"wall {wall:.2f}s ({args.seconds / wall:.1f}x realtime per stream, "
          f"{N * args.seconds / wall:.1f}x aggregate)")
    if args.realtime:
        print(f"realtime feed: push-occupancy {100 * busy / wall:.1f}% "
              f"(headroom ~{N * wall / max(busy, 1e-9):.0f} streams at this "
              f"geometry)")
    print(f"per-block compute latency ms: p50 {np.percentile(lat_ms, 50):.1f} "
          f"p95 {np.percentile(lat_ms, 95):.1f} max {lat_ms.max():.1f}")
    print(f"algorithmic lookahead: {algo_ms:.0f} ms "
          f"(block {args.block} + right_context {args.context} + "
          f"halo {se.latency_frames} frames)")


if __name__ == "__main__":
    main()
