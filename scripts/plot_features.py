"""Visualize feature channels of a clip (the reference ships similar figures).

    python scripts/plot_features.py --wav path/to/clip.wav --feature-type salsa \
        --audio-format foa --out salsa.png
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", required=True)
    ap.add_argument("--feature-type", default="salsa")
    ap.add_argument("--audio-format", default="foa")
    ap.add_argument("--fs", type=int, default=24000)
    ap.add_argument("--n-fft", type=int, default=512)
    ap.add_argument("--hop", type=int, default=300)
    ap.add_argument("--out", default="features.png")
    ap.add_argument("--seconds", type=float, default=16.0)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from salsa_tpu.features.registry import make_extractor
    from salsa_tpu.utils.audio_io import read_wav

    audio, fs = read_wav(args.wav)
    assert fs == args.fs, f"wav fs {fs} != --fs {args.fs}"
    audio = audio[:, : int(args.seconds * fs)]
    ex = make_extractor(args.feature_type, args.audio_format, fs=fs,
                        n_fft=args.n_fft, hop_length=args.hop)
    feat = np.asarray(ex(audio))  # (C, T, F)

    C = feat.shape[0]
    fig, axes = plt.subplots(C, 1, figsize=(12, 1.8 * C), sharex=True)
    extent = [0, feat.shape[1] * args.hop / fs, 0, feat.shape[2]]
    for c in range(C):
        spec_chan = c < ex.n_spec_channels
        axes[c].imshow(feat[c].T, aspect="auto", origin="lower", extent=extent,
                       cmap="magma" if spec_chan else "coolwarm")
        axes[c].set_ylabel(f"ch{c}")
    axes[-1].set_xlabel("time (s)")
    fig.suptitle(f"{args.feature_type} ({args.audio_format}) — {args.wav}")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({feat.shape})")


if __name__ == "__main__":
    main()
