"""Inference CLI (surface parity with reference experiments/inference.py): restores
the best (or latest) checkpoint, runs a split through the model, writes submission
CSVs, and scores them when ground truth exists.

    python -m salsa_tpu.cli.infer --exp-config configs/seld.yml \
        --exp-group-dir ./outputs --exp-suffix _run1 --splits val test
"""
from __future__ import annotations

import argparse
import os

from salsa_tpu.cli.train import build_database_from_cfg
from salsa_tpu.metrics.scorer import evaluate_submissions
from salsa_tpu.models.seld import build_model
from salsa_tpu.train import checkpoint as ckpt
from salsa_tpu.train.trainer import SeldTrainer
from salsa_tpu.utils.experiments import manage_experiments, logger
from salsa_tpu.cli._errors import cli_entry


def inference(exp_config: str, exp_group_dir: str = "./outputs", exp_suffix: str = "",
              splits=("val", "test"), checkpoint_kind: str = "best",
              use_tta: bool = False, tune_threshold: bool = False,
              use_tuned_threshold: bool = False):
    cfg = manage_experiments(exp_config, exp_group_dir, exp_suffix, is_train=False)
    tuned: float | None = None
    if tune_threshold:
        # calibrate on val FIRST, then apply the tuned operating point to the
        # remaining splits (the challenge-entry workflow: re-tune on val
        # before scoring/submitting test)
        splits = ["val"] + [s for s in splits if s != "val"]
    elif use_tuned_threshold:
        from salsa_tpu.train.threshold import load_tuned_threshold

        tuned = load_tuned_threshold(cfg.dir.model.best)
        if tuned is None:
            raise FileNotFoundError(
                "--use-tuned-threshold: no tuned_threshold.json beside the "
                "checkpoints — run `salsa-infer --tune-threshold` first")
        logger.info("using persisted tuned sed_threshold %.2f", tuned)
    from_wav = cfg.training.get("from_wav", False)
    db = None if from_wav else build_database_from_cfg(cfg)
    model = build_model(
        encoder=cfg.model.encoder.to_dict(),
        decoder=cfg.model.decoder.to_dict(),
        n_classes=cfg.data.n_classes,
        output_format=cfg.data.get("output_format", "reg_xyz"),
    )

    results = {}
    split_meta_dir = cfg.get("split_meta_dir")
    for split in splits:
        if from_wav:
            # from_wav experiments carry no feature store: extract this split's
            # features on device (seconds of chip time) from the wav tree, using
            # the scaler persisted by training
            import numpy as np

            from salsa_tpu.data.meta import split_filenames
            from salsa_tpu.data.wav_database import extract_split_to_store
            from salsa_tpu.features.registry import make_extractor

            d = cfg.data
            scaler_path = os.path.join(os.path.dirname(cfg.dir.model.best),
                                       "feature_scaler.npz")
            if not os.path.isfile(scaler_path):
                raise FileNotFoundError(
                    f"{scaler_path} not found — was this experiment trained "
                    "with training.from_wav?")
            blob = np.load(scaler_path)
            scaler = (blob["mean"], blob["std"])
            sub = "metadata_eval" if split == "eval" else "metadata_dev"
            fmt_dir = f"{d.audio_format}_{'eval' if split == 'eval' else 'dev'}"
            audio_dir = cfg.get("audio_root_dir") or os.path.join(
                cfg.gt_meta_root_dir, fmt_dir)
            if not os.path.isdir(audio_dir):
                audio_dir = os.path.join(cfg.gt_meta_root_dir,
                                         f"{d.audio_format}_dev")
            extractor = make_extractor(
                cfg.feature_type, d.audio_format, fs=d.fs, n_fft=d.n_fft,
                hop_length=d.hop_len, win_length=d.get("win_len", d.n_fft),
                n_mels=d.get("n_mels", 128), fmin=d.get("fmin", 50),
                fmax=d.get("fmax", None),
                fmin_doa=d.get("fmin_doa", 50), fmax_doa=d.get("fmax_doa", None),
            )
            store = extract_split_to_store(
                extractor, split_filenames(split, split_meta_dir), audio_dir,
                d.fs, scaler)
            db = build_database_from_cfg(cfg, store=store)
        data = db.load_split(split, split_meta_dir=split_meta_dir, stage="inference")
        trainer = SeldTrainer(
            model=model, cfg=cfg, train_data=data, val_data=None,
            gt_meta_dir=None, submission_dir=cfg.dir.output_dir.submission,
        )
        if checkpoint_kind == "best":
            path = ckpt.best_checkpoint(cfg.dir.model.best) or ckpt.latest_checkpoint(
                cfg.dir.model.checkpoint
            )
        else:
            path = ckpt.latest_checkpoint(cfg.dir.model.checkpoint)
        if path is None:
            raise FileNotFoundError("no checkpoint found; train first")
        trainer.state = ckpt.restore_checkpoint(path, trainer.state)
        logger.info("[%s] restored %s (meta: %s)", split, path, ckpt.load_metadata(path))

        tta = None
        if use_tta:
            from salsa_tpu.train.tta import ChannelSwapTTA, tta_kind

            tta = ChannelSwapTTA(tta_kind(cfg.feature_type, cfg.data.audio_format),
                                 cfg.data.n_classes,
                                 n_input_channels=cfg.model.encoder.n_input_channels)
            logger.info("[%s] TTA enabled: %d symmetry variants", split, len(tta))

        if tuned is not None:
            trainer.sed_threshold = tuned
        sub_dir = os.path.join(cfg.dir.output_dir.submission, split)
        pred_dir = os.path.join(cfg.dir.output_dir.prediction, split)
        written = trainer.predict_split(data, sub_dir, tta=tta,
                                        output_pred_dir=pred_dir)
        logger.info("[%s] wrote %d submissions to %s", split, len(written), sub_dir)

        gt_dir = os.path.join(
            cfg.gt_meta_root_dir,
            "metadata_eval" if split == "eval" else "metadata_dev",
        )
        if tune_threshold and split == "val":
            if not os.path.isdir(gt_dir):
                raise FileNotFoundError(
                    f"--tune-threshold needs val ground truth at {gt_dir}")
            from salsa_tpu.train.ensemble import (ensemble_predictions,
                                                  write_ensemble)
            from salsa_tpu.train.threshold import (save_tuned_threshold,
                                                   sweep_fused)

            fused = ensemble_predictions([pred_dir])
            sweep = sweep_fused(
                fused, gt_dir, cfg.data.n_classes,
                version=str(cfg.get("eval_version", "2021")),
                doa_threshold=cfg.get("doa_threshold", 20),
                label_rate=cfg.data.label_rate)
            tuned = sweep["best"]["threshold"]
            path = save_tuned_threshold(cfg.dir.model.best, sweep)
            at_default = next(
                (r for r in sweep["rows"]
                 if abs(r["threshold"] - trainer.sed_threshold) < 1e-9), None)
            logger.info(
                "[val] tuned sed_threshold %.2f (SELD %.4f vs %.4f at the "
                "fixed %.2f) -> %s", tuned, sweep["best"]["seld"],
                at_default["seld"] if at_default else float("nan"),
                trainer.sed_threshold, path)
            # re-write the val submissions at the tuned operating point so
            # this run's artifacts are self-consistent (host-only rewrite;
            # single-member fusion == thresholding the dumps, test-pinned)
            written = write_ensemble(
                fused, sub_dir, cfg.data.n_classes, sed_threshold=tuned,
                version=str(cfg.get("eval_version", "2021")))
            results["tuned_threshold"] = tuned
            results["threshold_sweep"] = sweep
        if os.path.isdir(gt_dir) and split != "eval":
            scores = evaluate_submissions(
                sub_dir, gt_dir, version=str(cfg.get("eval_version", "2021")),
                n_classes=cfg.data.n_classes,
                doa_threshold=cfg.get("doa_threshold", 20),
                label_rate=cfg.data.label_rate, filenames=written,
            )
            logger.info("[%s] SELD %.4f ER %.4f F1 %.4f LE %.2f LR %.4f", split,
                        scores["seld_error"], scores["ER"], scores["F1"],
                        scores["LE"], scores["LR"])
            results[split] = scores
    return results


@cli_entry
def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp-config", required=True)
    p.add_argument("--exp-group-dir", default="./outputs")
    p.add_argument("--exp-suffix", default="")
    p.add_argument("--splits", nargs="+", default=["val", "test"])
    p.add_argument("--checkpoint", default="best", choices=["best", "last"])
    p.add_argument("--tta", action="store_true",
                   help="average predictions over channel-swap symmetry variants")
    p.add_argument("--tune-threshold", action="store_true",
                   help="calibrate sed_threshold on the val split (host-side "
                        "sweep over the prediction dumps), persist the argmin "
                        "beside the checkpoints, and apply it to the other "
                        "splits — the operating-point re-tune a challenge "
                        "entry performs before submitting")
    p.add_argument("--use-tuned-threshold", action="store_true",
                   help="apply a previously tuned sed_threshold "
                        "(tuned_threshold.json) instead of the config value")
    a = p.parse_args()
    inference(a.exp_config, a.exp_group_dir, a.exp_suffix, a.splits, a.checkpoint,
              use_tta=a.tta, tune_threshold=a.tune_threshold,
              use_tuned_threshold=a.use_tuned_threshold)


if __name__ == "__main__":
    main()
