"""Training CLI (surface parity with reference experiments/train.py):

    python -m salsa_tpu.cli.train --exp-config configs/seld.yml \
        --exp-group-dir ./outputs --exp-suffix _run1 [--resume]
"""
from __future__ import annotations

import argparse
import os

from salsa_tpu.data.database import SeldDatabase
from salsa_tpu.data.transforms import build_train_transforms
from salsa_tpu.models.seld import build_model
from salsa_tpu.train import checkpoint as ckpt
from salsa_tpu.train.trainer import SeldTrainer
from salsa_tpu.utils.experiments import manage_experiments, logger
from salsa_tpu.cli._errors import cli_entry

import numpy as np


def build_database_from_cfg(cfg, store=None) -> SeldDatabase:
    scaler_channels = 4 if cfg.feature_type.startswith("salsa") else None
    return SeldDatabase(
        feature_root_dir=cfg.get("feature_root_dir"),
        store=store,
        gt_meta_root_dir=cfg.gt_meta_root_dir,
        audio_format=cfg.data.audio_format,
        n_classes=cfg.data.n_classes,
        fs=cfg.data.fs,
        hop_len=cfg.data.hop_len,
        label_rate=cfg.data.label_rate,
        train_chunk_len_s=cfg.data.train_chunk_len_s,
        train_chunk_hop_len_s=cfg.data.train_chunk_hop_len_s,
        test_chunk_len_s=cfg.data.test_chunk_len_s,
        test_chunk_hop_len_s=cfg.data.test_chunk_hop_len_s,
        scaler_channels=scaler_channels,
        max_file_len_s=cfg.data.get("max_file_len_s", 60.0),
    )


def train(exp_config: str, exp_group_dir: str = "./outputs", exp_suffix: str = "",
          resume: bool = False, seed: int | None = None,
          overrides: list[str] | None = None):
    # multi-host: form the global runtime BEFORE any backend use. No-op unless
    # SALSA_COORDINATOR/SALSA_NUM_PROCESSES/SALSA_PROCESS_ID are set (or a TPU
    # pod / SLURM cluster is auto-detectable). See parallel/distributed.py.
    from salsa_tpu.parallel.distributed import initialize as dist_init

    dist_init()
    cfg = manage_experiments(exp_config, exp_group_dir, exp_suffix, is_train=True)
    if overrides:
        from salsa_tpu.utils.config import apply_overrides

        apply_overrides(cfg, overrides)
    seed = seed if seed is not None else cfg.get("seed", 2021)

    db = build_database_from_cfg(cfg)
    mode = cfg.get("mode", "crossval")
    train_split = "train" if mode == "crossval" else "dev"
    val_split = "val" if mode == "crossval" else None
    if mode == "eval" and "best_epoch" in cfg.training:
        # eval mode trains on the full dev set for the epoch count selected during
        # cross-validation (reference train.py:93-94)
        cfg.training.max_epochs = cfg.training.best_epoch

    split_meta_dir = cfg.get("split_meta_dir")
    preload = cfg.data.get("preload", True)  # False: stream chunks from disk
    scaler = None
    if cfg.training.get("from_wav", False):
        # fused raw-wav mode (SURVEY §7): no offline extract stage, no HDF5 —
        # waveforms go device-resident and features are computed inside the
        # jitted train step; scaler + val features are extracted on-device here
        from salsa_tpu.data.meta import split_filenames
        from salsa_tpu.data.wav_database import (
            extract_split_to_store,
            fit_scaler_from_waves,
            load_wav_split,
        )
        from salsa_tpu.features.registry import make_extractor

        d = cfg.data
        audio_dir = cfg.get("audio_root_dir") or os.path.join(
            cfg.gt_meta_root_dir, f"{d.audio_format}_dev")
        extractor = make_extractor(
            cfg.feature_type, d.audio_format, fs=d.fs, n_fft=d.n_fft,
            hop_length=d.hop_len, win_length=d.get("win_len", d.n_fft),
            n_mels=d.get("n_mels", 128), fmin=d.get("fmin", 50),
            fmax=d.get("fmax", None),
            fmin_doa=d.get("fmin_doa", 50), fmax_doa=d.get("fmax_doa", None),
            eig_method=cfg.training.get("eig_method", "auto"),
        )
        db.n_fft = d.n_fft
        from salsa_tpu.features.chunked import required_pad

        train_data = load_wav_split(
            db, train_split, audio_dir, split_meta_dir=split_meta_dir,
            wav_dtype=cfg.training.get("wav_dtype", "float32"),
            n_channels=extractor.n_channels, n_features=extractor.n_features,
            pad=required_pad(cfg.feature_type, d.n_fft),
        )
        scaler = fit_scaler_from_waves(extractor, train_data.clip_wavs,
                                       extractor.n_spec_channels)
        # persist for later inference runs (from_wav experiments have no
        # feature store to carry the scaler)
        scaler_path = os.path.join(os.path.dirname(cfg.dir.model.best),
                                   "feature_scaler.npz")
        os.makedirs(os.path.dirname(scaler_path), exist_ok=True)
        np.savez(scaler_path, mean=scaler[0], std=scaler[1])
        mode = cfg.training.get("from_wav_mode", "fused")
        if mode == "precompute":
            # best-of-both: device-extract the train split ONCE at startup into
            # an in-memory store and run the plain resident path — full
            # feature-fed step speed with still zero disk footprint. The fused
            # mode (default) keeps waveforms resident instead, trading ~12%
            # step time for a smaller device footprint and no host-RAM feature
            # copy (BENCH.md "Fused raw-wav training").
            train_store = extract_split_to_store(
                extractor, split_filenames(train_split, split_meta_dir),
                audio_dir, d.fs, scaler)
            pre_db = build_database_from_cfg(cfg, store=train_store)
            train_data = pre_db.load_split(train_split,
                                           split_meta_dir=split_meta_dir,
                                           stage="fit")
            cfg.training.from_wav = False
            cfg.training.device_data = True
            logger.info("from_wav precompute: %d train clips extracted on "
                        "device (%.2f GB features) -> resident path",
                        len(train_data.unique_clip_names),
                        train_data.features.nbytes / 1e9)
        else:
            logger.info("from_wav: %d train clips resident (%s, %.2f GB), "
                        "scaler fit on device -> %s",
                        len(train_data.clip_wavs), train_data.waves.dtype,
                        train_data.waves.nbytes / 1e9, scaler_path)
        val_data = None
        if val_split:
            val_store = extract_split_to_store(
                extractor, split_filenames(val_split, split_meta_dir), audio_dir,
                d.fs, scaler)
            val_db = build_database_from_cfg(cfg, store=val_store)
            val_data = val_db.load_split(val_split, split_meta_dir=split_meta_dir,
                                         stage="inference")
    else:
        train_data = db.load_split(train_split, split_meta_dir=split_meta_dir,
                                   stage="fit", preload=preload)
        val_data = (
            db.load_split(val_split, split_meta_dir=split_meta_dir,
                          stage="inference", preload=preload)
            if val_split
            else None
        )
    logger.info("train chunks: %d, val chunks: %s", len(train_data),
                len(val_data) if val_data is not None else "-")

    joint_t, feat_t = build_train_transforms(
        cfg.feature_type, cfg.data.audio_format, cfg.data.n_classes,
        train_data.feature_chunk_len, train_data.features.shape[2],
        rng=np.random.default_rng(seed),
    )

    model = build_model(
        encoder=cfg.model.encoder.to_dict(),
        decoder=cfg.model.decoder.to_dict(),
        n_classes=cfg.data.n_classes,
        output_format=cfg.data.get("output_format", "reg_xyz"),
    )

    trainer = SeldTrainer(
        model=model,
        cfg=cfg,
        train_data=train_data,
        val_data=val_data,
        gt_meta_dir=os.path.join(cfg.gt_meta_root_dir, "metadata_dev"),
        submission_dir=cfg.dir.output_dir.submission,
        joint_transform=joint_t,
        feature_transform=feat_t,
        seed=seed,
        scaler=scaler,
    )

    resume_path = ckpt.latest_checkpoint(cfg.dir.model.checkpoint) if resume else None
    trainer.fit(resume_from=resume_path)
    return trainer


@cli_entry
def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp-config", required=True)
    p.add_argument("--exp-group-dir", default="./outputs")
    p.add_argument("--exp-suffix", default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="dotted config overrides, repeatable")
    a = p.parse_args()
    train(a.exp_config, a.exp_group_dir, a.exp_suffix, a.resume, a.seed, a.overrides)


if __name__ == "__main__":
    main()
