"""Checkpointing of train state with sidecar JSON metadata.

The reference encodes validation metrics in checkpoint FILENAMES and re-parses them
with a regex at inference time (reference experiments/inference.py:56-62); here every
checkpoint carries a `.json` sidecar with step/epoch/metrics instead.

Two backends behind one interface:
  * 'msgpack' (default): flax serialization, single file, dependency-light;
  * 'orbax': ocp.StandardCheckpointer directory checkpoints — async-capable and the
    right choice for multi-host / sharded state.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization


def _state_payload(state) -> dict:
    return {
        "step": int(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }


def save_checkpoint(ckpt_dir: str, name: str, state, metadata: dict | None = None,
                    backend: str = "msgpack") -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, name)
    payload = _state_payload(state)
    if backend == "msgpack":
        out = path + ".msgpack"
        with open(out, "wb") as f:
            f.write(serialization.to_bytes(payload))
    elif backend == "orbax":
        import orbax.checkpoint as ocp

        out = path + ".orbax"
        ckptr = ocp.StandardCheckpointer()
        payload["step"] = np.asarray(payload["step"])  # orbax wants array leaves
        ckptr.save(os.path.abspath(out), payload, force=True)
        ckptr.wait_until_finished()
    else:
        raise ValueError(f"unknown checkpoint backend '{backend}'")
    meta = dict(metadata or {})
    meta["step"] = int(state.step)
    with open(path + ".json", "w") as f:
        json.dump(_jsonable(meta), f, indent=2)
    return out


def restore_checkpoint(path: str, state):
    """Restore a TrainState from a .msgpack file or .orbax directory."""
    if path.endswith(".orbax"):
        import orbax.checkpoint as ocp

        template = _state_payload(state)
        template["step"] = np.asarray(template["step"])
        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(os.path.abspath(path), template)
    else:
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


def _candidates(ckpt_dir: str) -> list[str]:
    return [f for f in os.listdir(ckpt_dir)
            if f.endswith(".msgpack") or f.endswith(".orbax")]


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = _candidates(ckpt_dir)
    if not cands:
        return None
    def key(fn):
        meta = load_metadata(os.path.join(ckpt_dir, fn))
        return meta.get("step", -1)
    return os.path.join(ckpt_dir, max(cands, key=key))


def best_checkpoint(ckpt_dir: str, metric: str = "valSeld", mode: str = "min") -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = _candidates(ckpt_dir)
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
