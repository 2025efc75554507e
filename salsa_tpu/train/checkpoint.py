"""Checkpointing of train state with sidecar JSON metadata.

The reference encodes validation metrics in checkpoint FILENAMES and re-parses them
with a regex at inference time (reference experiments/inference.py:56-62); here every
checkpoint directory carries a `meta.json` with step/epoch/metrics instead.
Serialization uses flax msgpack (stable across versions); Orbax can be slotted in
behind the same interface for async multi-host saving.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(ckpt_dir: str, name: str, state, metadata: dict | None = None) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, name)
    payload = {
        "step": int(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    with open(path + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(payload))
    meta = dict(metadata or {})
    meta["step"] = int(state.step)
    with open(path + ".json", "w") as f:
        json.dump(_jsonable(meta), f, indent=2)
    return path + ".msgpack"


def restore_checkpoint(path: str, state):
    """Restore a TrainState from `path` (.msgpack). Returns the updated state."""
    with open(path, "rb") as f:
        payload = serialization.from_bytes(
            {
                "step": 0,
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
            },
            f.read(),
        )
    return state.replace(
        step=int(payload["step"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
    )


def load_metadata(path: str) -> dict:
    meta_path = os.path.splitext(path)[0] + ".json"
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir) if f.endswith(".msgpack")]
    if not cands:
        return None
    def key(fn):
        meta = load_metadata(os.path.join(ckpt_dir, fn))
        return meta.get("step", -1)
    return os.path.join(ckpt_dir, max(cands, key=key))


def best_checkpoint(ckpt_dir: str, metric: str = "valSeld", mode: str = "min") -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir) if f.endswith(".msgpack")]
    scored = []
    for fn in cands:
        meta = load_metadata(os.path.join(ckpt_dir, fn))
        if metric in meta:
            scored.append((meta[metric], fn))
    if not scored:
        return latest_checkpoint(ckpt_dir)
    best = min(scored) if mode == "min" else max(scored)
    return os.path.join(ckpt_dir, best[1])


def _jsonable(tree):
    if isinstance(tree, dict):
        return {k: _jsonable(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_jsonable(v) for v in tree]
    if isinstance(tree, (np.floating, np.integer)):
        return tree.item()
    return tree
