"""Interop with the reference implementation's artifacts (torch checkpoints),
both directions: import a reference .ckpt to serve here, export a TPU-trained
model as a reference-compatible .ckpt."""
from salsa_tpu.interop.torch_ckpt import (
    load_torch_state_dict,
    torch_state_dict_to_flax,
)
from salsa_tpu.interop.torch_export import (
    flax_to_torch_state_dict,
    save_torch_checkpoint,
)

__all__ = [
    "load_torch_state_dict",
    "torch_state_dict_to_flax",
    "flax_to_torch_state_dict",
    "save_torch_checkpoint",
]
