"""Measure the augmentation quality gain (VERDICT r4 missing #2).

The reference's central ablation shows its augmentation stack is worth
SELD 0.352 -> 0.255 on TNSSE2021 FOA (reference README.md:44 and
figures/SELD_performances_with*_data_augmen*ation.png; wiring
dataset/datamodule.py:44-100). The transforms here are imported-reference-
exact and the swap algebra is property-tested, but a capability whose point
is a quality gain is unproven until the gain is measured — this script
measures it on the synthetic corpus, the only data in this environment:

  arm "off"      — no augmentation at all;
  arm "feature"  — frequency shift + cutout family only (no channel swaps);
  arm "full"     — the reference stack (label-coupled channel swaps + the
                   feature-only transforms).

Each arm is one scripts/synthetic_sanity.py run at identical config/seed
(only training.device_augment differs); rows print as JSON for BENCH.md.

Run solo on the TPU:
  python scripts/aug_ablation.py [--clips 48 --epochs 96 --seeds 33 34 35]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_arm(arm: str, clips: int, epochs: int, seed: int,
            encoder: str) -> dict:
    workdir = f"/tmp/salsa_tpu_augablate_s{seed}_{arm}"
    cmd = [sys.executable, os.path.join(HERE, "synthetic_sanity.py"),
           "--clips", str(clips), "--epochs", str(epochs), "--seed", str(seed),
           "--aug", arm, "--encoder", encoder, "--workdir", workdir]
    print("+", " ".join(cmd), flush=True)
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR="/tmp/salsa_tpu_jit_cache")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    sys.stdout.write(r.stdout[-2000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"arm {arm} (seed {seed}) failed")
    m = re.search(r'\{"synthetic_sanity": (.*)\}', r.stdout)
    if not m:
        raise RuntimeError(f"arm {arm}: no score line in output")
    return json.loads(m.group(1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=96)
    ap.add_argument("--seeds", type=int, nargs="+", default=[33],
                    help="data+init seeds; several give mean±sd per arm")
    ap.add_argument("--encoder", default="PannResNet22TPU")
    ap.add_argument("--arms", nargs="+", default=["off", "feature", "full"])
    args = ap.parse_args()

    import numpy as np

    table: dict[str, list[dict]] = {a: [] for a in args.arms}
    for seed in args.seeds:
        for arm in args.arms:
            s = run_arm(arm, args.clips, args.epochs, seed, args.encoder)
            table[arm].append(s)
            print(json.dumps({"aug_ablation_row": {
                "arm": arm, "seed": seed,
                "seld": round(s["seld_error"], 4), "ER": round(s["ER"], 4),
                "F1": round(s["F1"], 4), "LE": round(s["LE"], 2),
                "LR": round(s["LR"], 4)}}), flush=True)

    summary = {}
    for arm, rows in table.items():
        v = np.array([r["seld_error"] for r in rows])
        le = np.array([r["LE"] for r in rows])
        summary[arm] = {"seld_mean": round(float(v.mean()), 4),
                        "seld_sd": round(float(v.std(ddof=min(1, len(v) - 1))
                                                if len(v) > 1 else 0.0), 4),
                        "le_mean": round(float(le.mean()), 2),
                        "n": len(rows)}
    print(json.dumps({"aug_ablation": {
        "clips": args.clips, "epochs": args.epochs, "seeds": args.seeds,
        "encoder": args.encoder, "summary": summary}}), flush=True)


if __name__ == "__main__":
    main()
