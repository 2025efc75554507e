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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from salsa_tpu.models.seld import build_model
    from salsa_tpu.train.state import create_train_state, dropout_rng, make_optimizer
    from salsa_tpu.train.trainer import make_train_step

    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7,
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
    step = make_train_step(model, 12, (0.3, 0.7), "reg_xyz", 2.0)

    rng = dropout_rng(0)
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
