"""Experiment directory tree + logging setup (parity with the reference's
manage_experiments, utilities/experiments_utils.py:15-118): one folder per experiment
holding configs snapshot, logs, tensorboard, checkpoints (last + best) and outputs
(submissions, predictions)."""
from __future__ import annotations

import logging
import os
import sys
import time

from salsa_tpu.utils.config import AttrDict, load_config, save_config

logger = logging.getLogger("salsa_tpu")


def manage_experiments(
    exp_config: str,
    exp_group_dir: str,
    exp_suffix: str = "",
    is_train: bool = True,
) -> AttrDict:
    cfg = load_config(exp_config)
    exp_name = os.path.splitext(os.path.basename(exp_config))[0] + exp_suffix
    root = os.path.join(
        exp_group_dir, cfg.mode, cfg.data.audio_format, cfg.feature_type, exp_name
    )
    dirs = AttrDict(
        {
            "exp_dir": root,
            "config_dir": os.path.join(root, "configs"),
            "log_dir": os.path.join(root, "logs"),
            "tb_dir": os.path.join(root, "tensorboard"),
            "model": {
                "checkpoint": os.path.join(root, "models", "checkpoint"),
                "best": os.path.join(root, "models", "best"),
            },
            "output_dir": {
                "submission": os.path.join(root, "outputs", "submissions"),
                "prediction": os.path.join(root, "outputs", "predictions"),
            },
        }
    )
    for d in [dirs.config_dir, dirs.log_dir, dirs.tb_dir, dirs.model.checkpoint,
              dirs.model.best, dirs.output_dir.submission, dirs.output_dir.prediction]:
        os.makedirs(d, exist_ok=True)
    cfg.dir = dirs
    cfg.exp_name = exp_name

    if is_train:
        stamp = time.strftime("%Y%m%d_%H%M%S")
        save_config(cfg, os.path.join(dirs.config_dir, f"config_{stamp}.yml"))

    configure_logging(dirs.log_dir)
    logger.info("Experiment directory: %s", root)
    return cfg


def configure_logging(log_dir: str | None = None, level=logging.INFO) -> logging.Logger:
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger
