"""Error bars for the quality study (VERDICT r4 weak #5 / next #4).

Runs scripts/quality_evidence.py over several DATA seeds (independent
synthetic corpora, same budget) and reports mean±sd per quality row
(plain / TTA / 3-member ensemble / SWA / SWA+tail), so the measured TTA and
ensemble gains can be compared against run-to-run variance instead of being
single draws. One seed ≈ 6 trainings (3 members + TTA reuse + 2 SWA arms) —
run solo on the TPU:

  python scripts/quality_seeds.py --seeds 11 12 13 [--clips 48 --epochs 48]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_seed(seed: int, clips: int, epochs: int, members: int) -> dict:
    workdir = f"/tmp/salsa_tpu_quality_s{seed}"
    result_path = workdir + "_result.json"
    if os.path.isfile(result_path):  # durable resume: a crash mid-campaign
        with open(result_path) as f:  # (e.g. disk-full) must not cost the
            return json.load(f)       # finished seeds' ~45 min each
    cmd = [sys.executable, os.path.join(HERE, "quality_evidence.py"),
           "--clips", str(clips), "--epochs", str(epochs),
           "--members", str(members), "--data-seed", str(seed),
           "--workdir", workdir]
    print("+", " ".join(cmd), flush=True)
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR="/tmp/salsa_tpu_jit_cache")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"seed {seed} failed")
    m = re.search(r'\{"quality_evidence": (.*)\}\s*$', r.stdout, re.M)
    if not m:
        raise RuntimeError(f"seed {seed}: no results line")
    result = json.loads(m.group(1))
    with open(result_path, "w") as f:
        json.dump(result, f)
    return result


def _seld(row) -> float:
    return float(row["seld_error"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[11, 12, 13])
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=48)
    ap.add_argument("--members", type=int, default=3)
    args = ap.parse_args()

    per_seed = {}
    for seed in args.seeds:
        per_seed[seed] = run_seed(seed, args.clips, args.epochs, args.members)
        print(json.dumps({"seed_done": seed}), flush=True)

    # per-variant SELD across seeds: mean, sd, and the paired delta vs the
    # same seed's plain member (paired deltas cancel corpus difficulty)
    import numpy as np

    variants = {
        "plain": lambda r: _seld(r["tta"]["no_tta"]),
        "tta": lambda r: _seld(r["tta"]["tta"]),
        "ensemble": lambda r: float(r["ensemble"]["fused"]),
        "ensemble_best_member": lambda r: float(r["ensemble"]["best_member"]),
        "swa_plain_schedule": lambda r: _seld(r["swa"]["swa"]),
        "swa_tail_member": lambda r: _seld(r["swa_tail"]["member_const_tail"]),
        "swa_tail": lambda r: _seld(r["swa_tail"]["swa"]),
    }
    table = {}
    for name, get in variants.items():
        vals = []
        for seed, r in per_seed.items():
            try:
                vals.append(get(r))
            except (KeyError, IndexError, TypeError):
                pass
        if not vals:
            continue
        a = np.asarray(vals)
        table[name] = {"mean": round(float(a.mean()), 4),
                       "sd": round(float(a.std(ddof=1)) if len(a) > 1 else 0.0,
                                   4),
                       "n": len(a), "values": [round(v, 4) for v in vals]}
    # paired gains (same-seed deltas): negative = improvement
    for gain, (a, b) in {"tta_gain": ("tta", "plain"),
                         "ensemble_gain": ("ensemble",
                                           "ensemble_best_member"),
                         "swa_tail_gain": ("swa_tail", "swa_tail_member")
                         }.items():
        if a in table and b in table and table[a]["n"] == table[b]["n"]:
            d = np.asarray(table[a]["values"]) - np.asarray(table[b]["values"])
            table[gain] = {"mean": round(float(d.mean()), 4),
                           "sd": round(float(d.std(ddof=1))
                                       if len(d) > 1 else 0.0, 4),
                           "n": len(d), "values": [round(v, 4) for v in d]}
    print(json.dumps({"quality_seeds": {"seeds": args.seeds, "table": table}},
                     indent=1))


if __name__ == "__main__":
    main()
