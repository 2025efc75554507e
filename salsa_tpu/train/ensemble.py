"""Prediction-level ensemble fusion (model averaging).

The reference's DCASE2021 challenge entry — 2nd place — was an *ensemble* of
SALSA models (reference README.md:46-47,164-166), and its BaseModel dumps
per-clip h5 predictions (`event_frame_pred` / `doa_frame_pred`,
reference interfaces.py:182-202) precisely so that outputs from several
trained models can be fused after the fact; the repo itself ships no fusion
code. This module completes that workflow: weighted averaging of per-frame
event probabilities and DOA vectors across any number of prediction dumps
(different checkpoints, seeds, feature types, encoders, TTA on/off — anything
`salsa-infer --splits <s>` wrote with a prediction dir), then DCASE submission
writing and scoring through the same writer/scorer as single-model inference.

Fusion rule: arithmetic weighted mean of SED probabilities and of raw xyz DOA
outputs — the same linear combination `combine_chunks` (train/submission.py)
already applies across overlapping chunks of one model, extended across
models. DOA vectors are deliberately NOT re-normalized: reg_xyz trains tanh
outputs against unit targets but the writer only uses the direction, and the
reference's own chunk recombination averages without renormalizing.
"""
from __future__ import annotations

import os
from glob import glob

import numpy as np

__all__ = ["load_prediction_dir", "ensemble_predictions", "write_ensemble",
           "average_checkpoint_files"]


def load_prediction_dir(pred_dir: str) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Read every per-clip prediction dump in `pred_dir`.

    Returns {clip_name: (event_prob (T, n_classes), doa_xyz (T, 3*n_classes))}.
    """
    import h5py

    paths = sorted(glob(os.path.join(pred_dir, "*.h5")))
    if not paths:
        raise FileNotFoundError(f"no prediction dumps (*.h5) in {pred_dir!r} — "
                                "run salsa-infer with a prediction dir first")
    out = {}
    for p in paths:
        with h5py.File(p, "r") as hf:
            ep = np.asarray(hf["event_frame_pred"], dtype=np.float32)
            dp = np.asarray(hf["doa_frame_pred"], dtype=np.float32)
        # dumps carry a leading singleton batch axis (reference layout)
        out[os.path.splitext(os.path.basename(p))[0]] = (ep[0], dp[0])
    return out


def ensemble_predictions(
    pred_dirs: list[str], weights: list[float] | None = None
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Weighted mean of per-clip predictions across `pred_dirs`.

    Every directory must cover the same clip set with the same frame counts
    (they came from the same split); mismatches raise rather than silently
    fusing different data.
    """
    if weights is None:
        weights = [1.0] * len(pred_dirs)
    if len(weights) != len(pred_dirs):
        raise ValueError(f"{len(pred_dirs)} prediction dirs but "
                         f"{len(weights)} weights")
    wsum = float(sum(weights))
    if wsum <= 0:
        raise ValueError("ensemble weights must sum to a positive value")

    fused: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    names: set[str] | None = None
    for d, w in zip(pred_dirs, weights):
        preds = load_prediction_dir(d)
        if names is None:
            names = set(preds)
        elif set(preds) != names:
            only_here = set(preds) ^ names
            raise ValueError(
                f"prediction dirs cover different clip sets (e.g. "
                f"{sorted(only_here)[:3]}) — fuse dumps from the same split")
        for name, (ep, dp) in preds.items():
            if name in fused:
                fe, fd = fused[name]
                if fe.shape != ep.shape or fd.shape != dp.shape:
                    raise ValueError(
                        f"{name}: prediction shapes differ across members "
                        f"({fe.shape}/{fd.shape} vs {ep.shape}/{dp.shape})")
                fused[name] = (fe + w * ep, fd + w * dp)
            else:
                fused[name] = (w * ep, w * dp)
    return {n: (ep / wsum, dp / wsum) for n, (ep, dp) in fused.items()}


def average_checkpoint_files(
    paths: list[str], out_path: str, weights: list[float] | None = None
) -> str:
    """Parameter-space fusion (SWA-style): weighted mean of several same-shape
    checkpoints into ONE checkpoint — one inference pass instead of N.

    Float leaves of params/batch_stats are averaged (averaging BN running stats
    across same-architecture members is the standard cheap SWA approximation;
    for exactness re-estimate stats with a few forward passes); integer leaves
    (step, counters) and opt_state come from the first member — a fused
    checkpoint is an inference artifact, resuming training from it restarts the
    optimizer. Complements `ensemble_predictions` (output-space fusion), which
    is what the reference's challenge entry used.
    """
    from flax import serialization

    if weights is None:
        weights = [1.0] * len(paths)
    if len(weights) != len(paths):
        raise ValueError(f"{len(paths)} checkpoints but {len(weights)} weights")
    wsum = float(sum(weights))
    if wsum <= 0:
        raise ValueError("ensemble weights must sum to a positive value")
    if not out_path.endswith(".msgpack"):
        raise ValueError("averaged checkpoint must be written as .msgpack")

    def _load(p):
        with open(p, "rb") as f:
            return serialization.msgpack_restore(f.read())

    import jax

    base = _load(paths[0])
    flat_base, treedef = jax.tree.flatten(
        {"params": base["params"], "batch_stats": base["batch_stats"]})
    acc = [weights[0] * np.asarray(v, np.float64)
           if np.issubdtype(np.asarray(v).dtype, np.floating) else v
           for v in flat_base]
    for p, w in zip(paths[1:], weights[1:]):
        other = _load(p)
        flat, td = jax.tree.flatten(
            {"params": other["params"], "batch_stats": other["batch_stats"]})
        if td != treedef:
            raise ValueError(
                f"{p}: parameter tree differs from {paths[0]} — weight "
                "averaging needs identical architectures")
        for i, v in enumerate(flat):
            v = np.asarray(v)
            if np.issubdtype(v.dtype, np.floating):
                if v.shape != np.asarray(acc[i]).shape:
                    raise ValueError(
                        f"{p}: leaf shape {v.shape} != {np.asarray(acc[i]).shape}")
                acc[i] = acc[i] + w * v.astype(np.float64)
    out = []
    for orig, a in zip(flat_base, acc):
        orig = np.asarray(orig)
        if np.issubdtype(orig.dtype, np.floating):
            out.append((np.asarray(a) / wsum).astype(orig.dtype))
        else:
            out.append(orig)
    fused = jax.tree.unflatten(treedef, out)
    payload = {"step": base.get("step", 0), "params": fused["params"],
               "batch_stats": fused["batch_stats"],
               "opt_state": base.get("opt_state", {})}
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    import json

    with open(os.path.splitext(out_path)[0] + ".json", "w") as f:
        json.dump({"step": int(np.asarray(payload["step"])),
                   "averaged_from": [os.path.basename(p) for p in paths],
                   "weights": list(map(float, weights))}, f, indent=2)
    return out_path


def write_ensemble(
    fused: dict[str, tuple[np.ndarray, np.ndarray]],
    submission_dir: str,
    n_classes: int,
    sed_threshold: float = 0.3,
    version: str = "2021",
) -> list[str]:
    """Write one DCASE submission CSV per fused clip; returns filenames."""
    from salsa_tpu.train.submission import write_classwise_csv

    os.makedirs(submission_dir, exist_ok=True)
    written = []
    for name, (ep, dp) in sorted(fused.items()):
        fn = name + ".csv"
        write_classwise_csv(
            os.path.join(submission_dir, fn), ep, dp, n_classes,
            sed_threshold=sed_threshold, max_frames=ep.shape[0], version=version,
        )
        written.append(fn)
    return written
