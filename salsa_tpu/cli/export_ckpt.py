"""Export a trained salsa_tpu experiment as a reference-compatible PyTorch
checkpoint (the inverse of cli/import_ckpt.py):

    python -m salsa_tpu.cli.export_ckpt --exp-config configs/seld.yml \
        --exp-group-dir ./outputs --exp-suffix _run1 \
        --out /path/to/exported.ckpt

Reads the experiment's best checkpoint (or --ckpt for an explicit msgpack
path), maps the flax weights onto reference module names
(interop/torch_export.py), and writes a Lightning-style `.ckpt` whose
state_dict loads strictly into the reference's torch SeldModel — so models
trained here on TPU deploy into the reference's torch serving stack
(reference experiments/inference.py loads exactly such checkpoints).
"""
from __future__ import annotations

import argparse

from salsa_tpu.cli._errors import cli_entry
from salsa_tpu.interop import flax_to_torch_state_dict, save_torch_checkpoint
from salsa_tpu.models.seld import build_model
from salsa_tpu.train import checkpoint as ckpt
from salsa_tpu.train.state import create_train_state, make_optimizer
from salsa_tpu.utils.experiments import manage_experiments, logger


def export_checkpoint(exp_config: str, out: str,
                      exp_group_dir: str = "./outputs", exp_suffix: str = "",
                      ckpt_path: str | None = None) -> str:
    import jax.numpy as jnp

    cfg = manage_experiments(exp_config, exp_group_dir, exp_suffix,
                             is_train=False)
    if cfg.model.encoder.name != "PannResNet22":
        # PannResNet22TPU has the SAME parameter tree but pools before the stem
        # convs — its weights would load into the reference encoder and silently
        # compute a different function. Refuse rather than mis-deploy.
        raise ValueError(
            f"encoder '{cfg.model.encoder.name}' has no reference torch module "
            "with matching semantics; only PannResNet22 experiments export")
    if ckpt_path is None:
        ckpt_path = (ckpt.best_checkpoint(cfg.dir.model.best)
                     or ckpt.latest_checkpoint(cfg.dir.model.checkpoint))
        if ckpt_path is None:
            raise FileNotFoundError(
                f"no checkpoint under {cfg.dir.model.best} or "
                f"{cfg.dir.model.checkpoint} — train first or pass --ckpt")
    model = build_model(
        encoder=cfg.model.encoder.to_dict(),
        decoder=cfg.model.decoder.to_dict(),
        n_classes=cfg.data.n_classes,
        output_format=cfg.data.get("output_format", "reg_xyz"),
    )
    sample = jnp.zeros((1, cfg.model.encoder.n_input_channels, 64, 16),
                       jnp.float32)
    state = create_train_state(model, sample, make_optimizer(1), seed=0)
    state = ckpt.restore_checkpoint(ckpt_path, state)
    sd = flax_to_torch_state_dict(state.params, state.batch_stats)
    path = save_torch_checkpoint(out, sd, {"exported_from": ckpt_path})
    logger.info("exported %s (%d tensors) -> %s", ckpt_path, len(sd), path)
    return path


@cli_entry
def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp-config", required=True)
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--exp-group-dir", default="./outputs")
    p.add_argument("--exp-suffix", default="")
    p.add_argument("--ckpt", default=None,
                   help="explicit .msgpack checkpoint (default: the "
                        "experiment's best, else latest)")
    a = p.parse_args()
    export_checkpoint(a.exp_config, a.out, a.exp_group_dir, a.exp_suffix,
                      ckpt_path=a.ckpt)


if __name__ == "__main__":
    main()
