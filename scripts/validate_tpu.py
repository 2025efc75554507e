"""Hardware validation: runs the TPU-only checks that the CPU test suite cannot
(Mosaic-compiled Pallas kernel vs XLA path, compiled train step, fused pipeline).

    python scripts/validate_tpu.py

Exits non-zero on any failure; prints one JSON line per check.
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/salsa_tpu_jit_cache")
    assert jax.default_backend() != "cpu", "run this on a TPU host"
    failures = 0

    # 1. Pallas fused kernel == XLA path on a real clip
    from salsa_tpu.features.salsa import SalsaParams, extract_salsa

    fs, n = 24000, 24000 * 60
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    wave = (0.05 * rng.standard_normal((4, n))).astype(np.float32)
    wave += 0.3 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    x = jax.device_put(wave)
    a = np.asarray(jax.jit(
        lambda w: extract_salsa(w, SalsaParams(eig_method="power")))(x))
    b = np.asarray(jax.jit(
        lambda w: extract_salsa(w, SalsaParams(eig_method="pallas")))(x))
    ma, mb = np.any(a[4:] != 0, axis=0), np.any(b[4:] != 0, axis=0)
    disagree = float(np.mean(ma != mb))
    both = ma & mb
    maxdiff = float(np.max(np.abs(a[4:][:, both] - b[4:][:, both])))
    ok = disagree < 0.001 and maxdiff < 1e-2 and np.allclose(a[:4], b[:4], atol=1e-3)
    print(json.dumps({"check": "pallas_vs_xla", "ok": ok,
                      "mask_disagreement": disagree, "max_diff": maxdiff}))
    failures += not ok

    # 2. compiled train step produces finite decreasing loss
    from salsa_tpu.models.seld import build_model
    from salsa_tpu.train.state import create_train_state, dropout_rng, make_optimizer
    from salsa_tpu.train.trainer import make_train_step

    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7,
                 "compute_dtype": "bfloat16"},
        decoder={"name": "SeldDecoder", "decoder_type": "bigru",
                 "decoder_size": 64, "compute_dtype": "bfloat16"},
        n_classes=12,
    )
    xb = jnp.asarray(rng.standard_normal((8, 7, 128, 64)), jnp.float32)
    sed = jnp.asarray((rng.random((8, 16, 12)) < 0.3).astype(np.float32))
    doa = jnp.asarray(rng.standard_normal((8, 16, 36)) * 0.5, jnp.float32)
    tx = make_optimizer(100, lrs=(1e-3,) * 4)
    state = create_train_state(model, xb, tx, 0)
    step = make_train_step(model, 12, (0.3, 0.7), "reg_xyz", 2.0)
    key = dropout_rng(0)
    losses = []
    for _ in range(6):
        state, metrics = step(state, xb, sed, doa, key)
        losses.append(float(np.asarray(metrics["loss"])))
    ok = np.isfinite(losses).all() and losses[-1] < losses[0]
    print(json.dumps({"check": "train_step", "ok": bool(ok),
                      "loss_first_last": [round(losses[0], 4), round(losses[-1], 4)]}))
    failures += not ok

    # 3. fused serving pipeline end to end
    from salsa_tpu.features.registry import make_extractor
    from salsa_tpu.pipeline import SeldInferencePipeline

    ex = make_extractor("salsa", "foa", fs=fs, n_fft=512, hop_length=300, jit=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 7, 4801, 200), jnp.float32), train=False)
    mean = np.zeros((4, 1, 200), np.float32)
    std = np.ones((4, 1, 200), np.float32)
    pipe = SeldInferencePipeline(ex, model, variables, (mean, std), 2.0, 12)
    ev, dd = pipe(wave)
    ok = ev.shape == (600, 12) and np.isfinite(ev).all() and np.isfinite(dd).all()
    print(json.dumps({"check": "fused_pipeline", "ok": bool(ok),
                      "shapes": [list(ev.shape), list(dd.shape)]}))
    failures += not ok

    # 4. streaming serving on hardware: device-ingest mirror, int16 PCM on the
    # wire, two identical streams in one fused dispatch — streams must agree
    # exactly, and the streamed predictions must track the offline pipeline
    from salsa_tpu.streaming import StreamingExtractor, StreamingSeldPipeline

    se = StreamingExtractor("salsa", "foa", fs=fs, n_fft=512, hop_length=300,
                            block_frames=160, eig_method="pallas", n_streams=2)
    spipe = StreamingSeldPipeline(se, model, variables, (mean, std), 2.0, 12,
                                  left_context=256, right_context=256)
    pcm = np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)
    feed = np.stack([pcm, pcm])
    outs, push = [], 2400
    for i in range(0, n, push):
        outs += spipe.push(feed[..., i : i + push])
    outs += spipe.flush()
    ev_s = np.concatenate([o[0] for o in outs], axis=-2)
    streams_equal = bool(np.array_equal(ev_s[0], ev_s[1]))
    vs_offline = float(np.abs(ev_s[0] - np.asarray(ev)).max())
    ok = (ev_s.shape == (2, 600, 12) and bool(np.isfinite(ev_s).all())
          and streams_equal and vs_offline < 0.3)
    print(json.dumps({"check": "streaming_device_ingest", "ok": bool(ok),
                      "streams_equal": streams_equal,
                      "max_dev_vs_offline": round(vs_offline, 4)}))
    failures += not ok

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
