"""Feature extraction CLI: raw multichannel wavs -> per-clip HDF5 features + scaler.

Equivalent surface to the reference's three extraction CLIs
(dataset/feature_extraction.py, dataset/salsa_feature_extraction.py,
dataset/salsa_lite_feature_extraction.py) unified behind one entry point:

    python -m salsa_tpu.cli.extract --data-config configs/tnsse2021_salsa.yml \
        --feature-type salsa --task feature_scaler

TPU-native: clips are batched onto the device mesh and the entire extractor runs as
one jit graph per batch; on a single chip it still streams clip-by-clip through the
compiled kernel (the reference spends ~9 s/clip in Python+NumPy for SALSA — see
BASELINE.md; this path is the north-star benchmark).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax

from salsa_tpu.data.feature_store import FeatureStore, StreamingScaler
from salsa_tpu.features.registry import make_extractor
from salsa_tpu.utils.audio_io import read_wav
from salsa_tpu.utils.config import load_config
from salsa_tpu.utils.experiments import configure_logging, logger
from salsa_tpu.cli._errors import cli_entry


def extract_features(
    data_config: str,
    feature_type: str = "salsa",
    task: str = "feature_scaler",
    cond_num: float = 5.0,
    n_hopframes: int = 3,
    is_tracking: bool = True,
    is_compress_high_freq: bool = True,
    eig_method: str = "auto",
    splits: list[str] | None = None,
    batch_size: int = 8,
    keep_existing: bool = False,
) -> str:
    """Returns the feature directory written."""
    cfg = load_config(data_config)
    d = cfg.data
    audio_format = d.get("format", "foa")
    fs, n_fft, hop = d.fs, d.n_fft, d.hop_len
    win = d.get("win_len", n_fft)

    extractor = make_extractor(
        feature_type,
        audio_format,
        fs=fs,
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        n_mels=d.get("n_mels", 128),
        fmin=d.get("fmin", 50),
        fmax=d.get("fmax", None),
        fmin_doa=d.get("fmin_doa", 50),
        fmax_doa=d.get("fmax_doa", None),
        condition_number=cond_num,
        n_hopframes=n_hopframes,
        is_tracking=is_tracking,
        compress_high_freq=is_compress_high_freq,
        eig_method=eig_method,
    )

    if feature_type in ("salsa", "salsa_lite", "salsa_ipd"):
        feature_dir = os.path.join(
            cfg.feature_dir, feature_type, audio_format, extractor.description
        )
    else:
        feature_dir = os.path.join(cfg.feature_dir, feature_type, extractor.description)
    store = FeatureStore(feature_dir, audio_format)
    logger.info("Feature dir: %s", feature_dir)

    if splits is None:
        splits = [f"{audio_format}_dev", f"{audio_format}_eval"]

    # batched device fan-out: clips are stacked and sharded over the mesh's data
    # axis, so extraction scales clips x chips with one jit graph per clip shape
    from salsa_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    n_dev = mesh.shape["data"] * mesh.shape["model"]
    batch_size = max(batch_size - batch_size % n_dev, n_dev)
    batched_fn = jax.jit(jax.vmap(extractor.fn))

    if task in ("feature_scaler", "feature"):
        for split in splits:
            audio_dir = os.path.join(cfg.data_dir, split)
            if not os.path.isdir(audio_dir):
                logger.warning("skip split %s: %s not found", split, audio_dir)
                continue
            split_kind = "eval" if split.endswith("eval") else "dev"
            out_dir = store.split_dir(split_kind)
            if not keep_existing:
                # reference semantics: the split's feature folder is emptied first
                # (salsa_feature_extraction.py:344)
                import shutil

                shutil.rmtree(out_dir, ignore_errors=True)
            wavs = sorted(f for f in os.listdir(audio_dir) if f.endswith(".wav"))
            if keep_existing:
                wavs = [w for w in wavs
                        if not os.path.isfile(store.clip_path(split_kind, w[:-4]))]
                logger.info("[%s] resume: %d clips left to extract", split, len(wavs))
            t0 = time.time()
            audio_seconds = 0.0
            done = 0
            for start in range(0, len(wavs), batch_size):
                group = wavs[start : start + batch_size]
                audios = []
                for wav in group:
                    # non-native-rate input is resampled to the pipeline rate
                    # (reference librosa.load(sr=fs) semantics)
                    audio, wav_fs = read_wav(os.path.join(audio_dir, wav),
                                             target_fs=fs)
                    audio_seconds += audio.shape[1] / fs
                    audios.append(audio)
                n_real = len(audios)
                lens = {a.shape[1] for a in audios}
                if len(lens) > 1:
                    # mixed-length group: extract clip-by-clip (batching must not
                    # change per-clip frame counts)
                    for wav, audio in zip(group, audios):
                        feat = np.asarray(extractor(audio))
                        store.write_clip(split_kind, wav[:-4], feat)
                    done += n_real
                    continue
                stacked = np.stack(audios)
                if n_real < batch_size:  # pad tail group to the static batch shape
                    pad = np.repeat(stacked[-1:], batch_size - n_real, axis=0)
                    stacked = np.concatenate([stacked, pad], axis=0)
                feats = np.asarray(batched_fn(shard_batch(mesh, stacked)))
                for wav, feat in zip(group, feats[:n_real]):
                    store.write_clip(split_kind, wav[:-4], feat)
                done += n_real
                logger.info("[%s] %d/%d (last: %s %s)", split, done, len(wavs),
                            group[-1], feats.shape[1:])
            dt = time.time() - t0
            if wavs:
                logger.info(
                    "[%s] %d clips, %.1f audio-s in %.1f s (%.1fx realtime)",
                    split, len(wavs), audio_seconds, dt, audio_seconds / max(dt, 1e-9),
                )

    if task in ("feature_scaler", "scaler"):
        scaler = StreamingScaler(extractor.n_spec_channels)
        dev_dir = store.split_dir("dev")
        for fn in sorted(os.listdir(dev_dir)):
            if fn.endswith(".h5"):
                scaler.update(store.read_clip("dev", fn[:-3]))
        store.write_scaler(*scaler.finalize())
        logger.info("Scaler written: %s", store.scaler_path)

    return feature_dir


@cli_entry
def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-config", required=True)
    p.add_argument("--feature-type", default="salsa")
    p.add_argument("--task", default="feature_scaler",
                   choices=["feature_scaler", "feature", "scaler"])
    p.add_argument("--cond-num", type=float, default=5.0)
    p.add_argument("--n-hopframes", type=int, default=3)
    p.add_argument("--no-tracking", action="store_true")
    p.add_argument("--no-compress-high-freq", action="store_true")
    p.add_argument("--eig-method", default="auto",
                   choices=["auto", "power", "eigh", "pallas"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--keep-existing", action="store_true",
                   help="resume: skip clips whose feature file already exists "
                        "(default mirrors the reference and empties the folder)")
    args = p.parse_args()
    configure_logging()
    extract_features(
        args.data_config,
        feature_type=args.feature_type,
        task=args.task,
        cond_num=args.cond_num,
        n_hopframes=args.n_hopframes,
        is_tracking=not args.no_tracking,
        is_compress_high_freq=not args.no_compress_high_freq,
        eig_method=args.eig_method,
        batch_size=args.batch_size,
        keep_existing=args.keep_existing,
    )


if __name__ == "__main__":
    main()
