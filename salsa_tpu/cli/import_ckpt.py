"""Import a trained reference (PyTorch/Lightning) checkpoint for use here:

    python -m salsa_tpu.cli.import_ckpt --exp-config configs/seld.yml \
        --torch-ckpt /path/to/reference_epoch=41.ckpt \
        --exp-group-dir ./outputs --exp-suffix _imported

Writes models/best/best.msgpack into the experiment tree, after which
`python -m salsa_tpu.cli.infer` / `predict` serve the reference's trained weights
through the TPU pipeline without retraining. The name-based weight mapping
(interop/torch_ckpt.py) is forward-parity tested against torch to 5e-4.
"""
from __future__ import annotations

import argparse

import numpy as np

from salsa_tpu.cli._errors import cli_entry
from salsa_tpu.interop import load_torch_state_dict, torch_state_dict_to_flax
from salsa_tpu.models.seld import build_model
from salsa_tpu.train import checkpoint as ckpt
from salsa_tpu.train.state import create_train_state, make_optimizer
from salsa_tpu.utils.experiments import manage_experiments, logger


def import_checkpoint(exp_config: str, torch_ckpt: str,
                      exp_group_dir: str = "./outputs", exp_suffix: str = "",
                      trust_checkpoint: bool = False) -> str:
    import jax
    import jax.numpy as jnp

    cfg = manage_experiments(exp_config, exp_group_dir, exp_suffix, is_train=True)
    model = build_model(
        encoder=cfg.model.encoder.to_dict(),
        decoder=cfg.model.decoder.to_dict(),
        n_classes=cfg.data.n_classes,
        output_format=cfg.data.get("output_format", "reg_xyz"),
    )
    # dummy chunk just to initialize shapes; 64 frames x 16 bins is enough
    sample = jnp.zeros((1, cfg.model.encoder.n_input_channels, 64, 16), jnp.float32)
    state = create_train_state(model, sample, make_optimizer(1), seed=0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    torch_state = load_torch_state_dict(torch_ckpt,
                                        trust_checkpoint=trust_checkpoint)
    params, stats = torch_state_dict_to_flax(torch_state, variables)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    state = state.replace(params=params, batch_stats=stats)
    path = ckpt.save_checkpoint(
        cfg.dir.model.best, "best", state,
        {"imported_from": torch_ckpt, "n_params": n_params})
    logger.info("imported %s (%.2fM params) -> %s", torch_ckpt, n_params / 1e6, path)
    return path


@cli_entry
def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp-config", required=True)
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--exp-group-dir", default="./outputs")
    p.add_argument("--exp-suffix", default="")
    p.add_argument("--trust-checkpoint", action="store_true",
                   help="allow full (unsafe) unpickling for checkpoints that "
                        "torch.load(weights_only=True) cannot read")
    a = p.parse_args()
    import_checkpoint(a.exp_config, a.torch_ckpt, a.exp_group_dir, a.exp_suffix,
                      trust_checkpoint=a.trust_checkpoint)


if __name__ == "__main__":
    main()
