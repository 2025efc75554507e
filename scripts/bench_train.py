"""Secondary benchmark: training-step throughput for the headline SALSA-FOA CRNN
(batch 32 x (7, 640, 200) chunks — the reference's exact training shape).

Prints JSON with steps/s and audio-seconds/s of training throughput.
Usage: python scripts/bench_train.py [--batch 32] [--bf16]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--from-wav", action="store_true",
                    help="benchmark the FUSED raw-wav step (in-graph SALSA "
                         "extraction from device-resident waveforms) instead of "
                         "the feature-fed step")
    ap.add_argument("--eig-method", default="auto")
    ap.add_argument("--encoder", default="PannResNet22",
                    help="encoder registry name (PannResNet22TPU = lane-aligned "
                         "stem variant)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from salsa_tpu.models.seld import build_model
    from salsa_tpu.train.state import create_train_state, dropout_rng, make_optimizer
    from salsa_tpu.train.trainer import make_train_step

    model = build_model(
        encoder={"name": args.encoder, "n_input_channels": 7,
                 **({"compute_dtype": "bfloat16"} if args.bf16 else {})},
        decoder={"name": "SeldDecoder", "decoder_type": "bigru", "decoder_size": 256,
                 **({"compute_dtype": "bfloat16"} if args.bf16 else {})},
        n_classes=12,
    )
    B = args.batch
    x = jnp.zeros((B, 7, 640, 200), jnp.float32)
    sed = jnp.zeros((B, 80, 12), jnp.float32)
    doa = jnp.zeros((B, 80, 36), jnp.float32)
    tx = make_optimizer(total_steps=1000)
    state = create_train_state(model, x, tx, seed=0)
    rng = dropout_rng(0)

    if args.from_wav:
        # fused raw-wav step at flagship geometry: 60 s resident clips, 8 s
        # chunks extracted in-graph (features/chunked.py)
        from salsa_tpu.features.chunked import (
            make_chunk_extractor,
            pad_waveform,
            salsa_tracker_checkpoints,
        )
        from salsa_tpu.train.trainer import make_wav_resident_train_step

        fs, n_fft, hop, chunk_len = 24000, 512, 300, 640
        n_clips = 4
        rng_np = np.random.default_rng(0)
        wav = (rng_np.standard_normal((n_clips, 4, fs * 60)) * 0.1
               ).astype(np.float32)
        padded = np.stack([pad_waveform(w, n_fft) for w in wav])
        n_full = 1 + fs * 60 // hop
        chunk_fn, p = make_chunk_extractor(
            "salsa", "foa", chunk_len, fs=fs, n_fft=n_fft, hop_length=hop,
            eig_method=args.eig_method)
        starts = np.arange(0, n_full - chunk_len - 8, 40, dtype=np.int32)
        fls, cds = zip(*[salsa_tracker_checkpoints(padded[c], starts, p)
                         for c in range(n_clips)])
        n_chunks = n_clips * len(starts)
        chunk_clip = np.repeat(np.arange(n_clips, dtype=np.int32), len(starts))
        F = p.freq_dim
        scaler = (np.zeros((4, 1, F), np.float32), np.ones((4, 1, F), np.float32))
        step_wav = make_wav_resident_train_step(
            model, 12, (0.3, 0.7), "reg_xyz", 2.0, chunk_len, 80,
            chunk_fn, scaler, 4, 1.0)
        tables = tuple(jnp.asarray(a) for a in (
            chunk_clip,
            np.tile(starts, n_clips),
            np.full(n_chunks, n_full, np.int32),
            np.full(n_chunks, chunk_len, np.int32),
            (np.tile(starts, n_clips) // 8).astype(np.int32),
            np.concatenate(fls), np.concatenate(cds),
        ))
        waves_dev = jnp.asarray(padded)
        sed_t = jnp.zeros((n_full // 8 * n_clips, 12), jnp.float32)
        doa_t = jnp.zeros((n_full // 8 * n_clips, 36), jnp.float32)
        idx_rng = np.random.default_rng(1)

        def run(state):
            idx = jnp.asarray(
                idx_rng.integers(0, n_chunks, size=B).astype(np.int32))
            return step_wav(state, waves_dev, sed_t, doa_t, tables, idx, rng)

        state, metrics = run(state)  # compile
        _ = float(np.asarray(metrics["loss"]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = run(state)
        loss = float(np.asarray(metrics["loss"]))  # fence
        dt = time.perf_counter() - t0
        steps_per_s = args.iters / dt
        print(json.dumps({
            "metric": "train_step_throughput_from_wav",
            "steps_per_s": round(steps_per_s, 2),
            "audio_s_per_s": round(steps_per_s * B * 8.0, 1),
            "batch": B, "bf16": args.bf16, "eig_method": p.eig_method,
            "loss": loss,
        }))
        return

    step = make_train_step(model, 12, (0.3, 0.7), "reg_xyz", 2.0)

    state, metrics = step(state, x, sed, doa, rng)  # compile
    _ = float(np.asarray(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, x, sed, doa, rng)
    loss = float(np.asarray(metrics["loss"]))  # fence
    dt = time.perf_counter() - t0

    steps_per_s = args.iters / dt
    audio_s_per_s = steps_per_s * B * 8.0  # 8-second chunks
    print(json.dumps({
        "metric": "train_step_throughput",
        "steps_per_s": round(steps_per_s, 2),
        "audio_s_per_s": round(audio_s_per_s, 1),
        "batch": B,
        "bf16": args.bf16,
        "loss": loss,
    }))


if __name__ == "__main__":
    main()
