"""Train-step breakdown by ablation (the methodology behind BENCH.md's analysis).

Measures, on the current backend, for the headline CRNN at a given batch size:
  * full train step (donated state, optimizer included)
  * forward in train mode / eval mode (isolates dropout + BN-stat cost)
  * forward+backward with all gradients materialized
  * practical-peak bf16 matmul rate, for an honest utilization denominator

Timing fences fetch a scalar to host (block_until_ready is not a reliable fence
on every PJRT transport). Prints one JSON object.

Usage: python scripts/profile_step.py [--batch 32] [--iters 10]
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
    ap.add_argument("--encoder", default="PannResNet22",
                    help="encoder registry name (PannResNet22TPU = lane-aligned "
                         "stem variant)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/salsa_tpu_jit_cache")

    from salsa_tpu.models.seld import build_model
    from salsa_tpu.train.state import create_train_state, dropout_rng, make_optimizer
    from salsa_tpu.train.trainer import make_train_step

    B, ITERS = args.batch, args.iters

    def timeit(f, *fargs):
        r = f(*fargs)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = f(*fargs)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        return (time.perf_counter() - t0) / ITERS * 1000

    model = build_model(
        encoder={"name": args.encoder, "n_input_channels": 7,
                 "compute_dtype": "bfloat16"},
        decoder={"name": "SeldDecoder", "decoder_type": "bigru", "decoder_size": 256,
                 "compute_dtype": "bfloat16"},
        n_classes=12)
    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.standard_normal((B, 7, 640, 200)), jnp.float32)
    sed = jnp.asarray((rng_np.random((B, 80, 12)) < 0.2).astype(np.float32))
    doa = jnp.asarray(rng_np.standard_normal((B, 80, 36)) * 0.5, jnp.float32)
    tx = make_optimizer(total_steps=1000)
    state = create_train_state(model, x, tx, seed=0)
    params, stats = state.params, state.batch_stats
    rng = dropout_rng(0)

    out = {"batch": B, "device": jax.devices()[0].device_kind}

    # full step (chain donated states)
    step = make_train_step(model, 12, (0.3, 0.7), "reg_xyz", 2.0)
    st, m = step(state, x, sed, doa, rng)
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, m = step(st, x, sed, doa, rng)
    float(np.asarray(m["loss"]))
    out["full_step_ms"] = round((time.perf_counter() - t0) / ITERS * 1000, 1)
    state = create_train_state(model, x, tx, seed=0)
    params, stats = state.params, state.batch_stats

    def loss_of(p, s, xx, train):
        if train:
            o, _ = model.apply({"params": p, "batch_stats": s}, xx, train=True,
                               mutable=["batch_stats"], rngs={"dropout": rng})
        else:
            o = model.apply({"params": p, "batch_stats": s}, xx, train=False)
        return (o["event_frame_logit"].astype(jnp.float32).sum()
                + o["doa_frame_output"].astype(jnp.float32).sum())

    out["fwd_train_ms"] = round(timeit(
        jax.jit(lambda p, s, xx: loss_of(p, s, xx, True)), params, stats, x), 1)
    out["fwd_eval_ms"] = round(timeit(
        jax.jit(lambda p, s, xx: loss_of(p, s, xx, False)), params, stats, x), 1)

    @jax.jit
    def fwdbwd(p, s, xx):
        l, g = jax.value_and_grad(lambda pp: loss_of(pp, s, xx, True))(p)
        return l + sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(g))

    out["fwd_bwd_ms"] = round(timeit(fwdbwd, params, stats, x), 1)

    # practical peak for the utilization denominator
    a = jnp.asarray(rng_np.standard_normal((8192, 8192)), jnp.bfloat16)
    b = jnp.asarray(rng_np.standard_normal((8192, 8192)), jnp.bfloat16)
    mm_ms = timeit(jax.jit(lambda a, b: (a @ b).astype(jnp.float32).sum()), a, b)
    out["peak_matmul_tflops"] = round(2 * 8192**3 / 1e9 / mm_ms, 0)

    # effective rate: conv FLOPs of this model ~= 1.4 TF fwd (x3 for fwd+bwd);
    # the TPU stem runs its two convs (10.5 GF/sample) at quarter resolution,
    # dropping ~7.9 GF/sample of the parity encoder's ~43.75
    flops_fwd_g = (1400 if args.encoder == "PannResNet22" else 1149) * B / 32
    out["effective_tflops_fwd_bwd"] = round(3 * flops_fwd_g / out["fwd_bwd_ms"], 0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
