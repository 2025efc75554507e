"""Interop with the reference implementation's artifacts (torch checkpoints)."""
from salsa_tpu.interop.torch_ckpt import (
    load_torch_state_dict,
    torch_state_dict_to_flax,
)

__all__ = ["load_torch_state_dict", "torch_state_dict_to_flax"]
