"""Import trained reference (PyTorch / Lightning) checkpoints into salsa_tpu.

A user of the reference repo has `.ckpt` files from pl.Trainer (state_dict keys
`encoder.*` / `decoder.*`, possibly under a `model.` prefix — reference
experiments/train.py builds SeldModel(encoder, decoder)). This module maps those
weights by NAME onto the flax CRNN so existing trained models serve here without
retraining:

  * encoder: torch insertion order (conv_block1 conv1/bn1/conv2/bn2, then each
    ResNet block's conv1/bn1/conv2/bn2 followed by its downsample conv/bn —
    reference model_utils.py:312-500) is zipped against the flax module trace
    order, which lists the shortcut projection last within each block;
  * decoder: torch.nn.GRU/LSTM flat parameters (weight_ih_l{n}[_reverse], ...)
    onto RNNStack's l{n}_{fwd,bwd}/{wi,wh,bi,bh} (gate layouts already match,
    models/rnn.py), and the SED/DOA head Linears onto their Dense twins.

Numerical parity of every sub-mapping is proven by the transplant tests
(tests/test_models.py, tests/test_decoder_parity.py); tests/test_interop.py
drives THIS converter end to end against reference torch modules.

Conversion is pure NumPy — torch is only needed to unpickle the checkpoint.
"""
from __future__ import annotations

from typing import Any

import numpy as np


def load_torch_state_dict(path: str, *, trust_checkpoint: bool = False
                          ) -> dict[str, np.ndarray]:
    """Load a reference checkpoint into {key: np.ndarray}, handling both raw
    state_dicts and Lightning checkpoints, and stripping a 'model.' prefix.

    Loads with ``weights_only=True`` (no arbitrary-code unpickling) — Lightning
    checkpoints of plain tensors load fine that way. Pass
    ``trust_checkpoint=True`` (CLI: ``--trust-checkpoint``) only for files from
    a trusted source that need full pickle, e.g. ones embedding custom classes;
    that path can execute code at load time."""
    import torch

    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not trust_checkpoint:
            raise ValueError(
                f"{path} needs full (unsafe) unpickling to load. If you trust "
                "its producer, retry with trust_checkpoint=True "
                "(CLI: --trust-checkpoint).")
        blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in state.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _module_groups(state: dict[str, np.ndarray], root: str):
    """Group `root.*` keys by owning module prefix, preserving insertion order.
    Returns [(prefix, {param_name: array})]."""
    groups: dict[str, dict[str, np.ndarray]] = {}
    for k, v in state.items():
        if not k.startswith(root + "."):
            continue
        prefix, name = k[len(root) + 1 :].rsplit(".", 1)
        groups.setdefault(prefix, {})[name] = v
    return list(groups.items())


def _classify(params: dict[str, np.ndarray]) -> str:
    if "running_mean" in params:
        return "bn"
    if "weight" in params and params["weight"].ndim == 4:
        return "conv"
    if "weight" in params and params["weight"].ndim == 2:
        return "linear"
    return "other"


def _flax_encoder_paths(params: dict) -> list[tuple[tuple[str, ...], str]]:
    """(path, kind) pairs in flax trace order for PannResNet22 (mirrors the
    verified mapping in tests/test_models.py::_flatten_flax_convbn_paths)."""
    paths: list[tuple[tuple[str, ...], str]] = []
    for i in range(2):
        paths.append((("DoubleConvBlock_0", f"ConvBnRelu_{i}", "Conv_0"), "conv"))
        paths.append((("DoubleConvBlock_0", f"ConvBnRelu_{i}", "BatchNorm_0"), "bn"))
    trunk = params["ResNetTrunk_0"]
    n_blocks = len([k for k in trunk if k.startswith("ResNetBasicBlock_")])
    for b in range(n_blocks):
        base = ("ResNetTrunk_0", f"ResNetBasicBlock_{b}")
        block = trunk[f"ResNetBasicBlock_{b}"]
        paths.append((base + ("Conv_0",), "conv"))
        paths.append((base + ("BatchNorm_0",), "bn"))
        paths.append((base + ("Conv_1",), "conv"))
        paths.append((base + ("BatchNorm_1",), "bn"))
        if "Conv_2" in block:
            paths.append((base + ("Conv_2",), "conv"))
            paths.append((base + ("BatchNorm_2",), "bn"))
    return paths


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _torch_encoder_sequence(groups):
    """Order the reference encoder's conv/bn modules by their structural names
    (conv_block1 pairs, then each ResNet block's mains followed by its downsample)
    — state_dict insertion order interleaves differently (conv1, conv2, bn1, bn2)."""
    gd = dict(groups)
    if "conv_block1.conv1" not in gd:
        raise ValueError(
            "checkpoint does not look like a reference PannResNet22 encoder "
            f"(no conv_block1.conv1; found modules: {sorted(gd)[:6]}...)")
    seq = []
    for mod in ("conv_block1.conv1", "conv_block1.bn1",
                "conv_block1.conv2", "conv_block1.bn2"):
        seq.append((mod, gd[mod]))
    layer = 1
    while f"resnet.layer{layer}.0.conv1" in gd:
        i = 0
        while f"resnet.layer{layer}.{i}.conv1" in gd:
            base = f"resnet.layer{layer}.{i}"
            for part in ("conv1", "bn1", "conv2", "bn2"):
                seq.append((f"{base}.{part}", gd[f"{base}.{part}"]))
            ds = sorted(p for p in gd if p.startswith(base + ".downsample"))
            for p in [p for p in ds if _classify(gd[p]) == "conv"]:
                seq.append((p, gd[p]))
            for p in [p for p in ds if _classify(gd[p]) == "bn"]:
                seq.append((p, gd[p]))
            i += 1
        layer += 1
    return seq


def _import_encoder(state, params, stats) -> int:
    torch_seq = _torch_encoder_sequence(
        [(p, g) for p, g in _module_groups(state, "encoder")
         if _classify(g) in ("conv", "bn")])
    flax_paths = _flax_encoder_paths(params["encoder"])
    if len(torch_seq) != len(flax_paths):
        raise ValueError(
            f"encoder layout mismatch: checkpoint has {len(torch_seq)} conv/bn "
            f"modules, model expects {len(flax_paths)} — same encoder config?")
    for (prefix, g), (path, kind) in zip(torch_seq, flax_paths):
        if _classify(g) != kind:
            raise ValueError(f"encoder module '{prefix}' is {_classify(g)}, "
                             f"expected {kind} at {'/'.join(path)}")
        if kind == "conv":
            _set(params["encoder"], path + ("kernel",),
                 np.transpose(g["weight"], (2, 3, 1, 0)))
        else:
            _set(params["encoder"], path + ("scale",), g["weight"])
            _set(params["encoder"], path + ("bias",), g["bias"])
            _set(stats["encoder"], path + ("mean",), g["running_mean"])
            _set(stats["encoder"], path + ("var",), g["running_var"])
    return len(torch_seq)


def transformer_layer_params(get, d_model: int, n_heads: int) -> dict:
    """Map one torch nn.TransformerEncoderLayer's tensors onto our flax
    TransformerEncoderLayer param tree (reference decoders.py:63-72; post-LN,
    relu FF). `get(name)` returns the torch tensor for e.g. 'self_attn.in_proj_weight'.

    torch packs q/k/v into in_proj_weight rows [q; k; v], each row-major over
    (head, head_dim); flax wants per-projection kernels (d_in, heads, head_dim)
    contracted as x @ kernel, i.e. the torch weight transposed then reshaped."""
    head_dim = d_model // n_heads
    in_w = np.asarray(get("self_attn.in_proj_weight"))
    in_b = np.asarray(get("self_attn.in_proj_bias"))
    proj = {}
    for i, name in enumerate(("query", "key", "value")):
        w = in_w[i * d_model : (i + 1) * d_model]
        b = in_b[i * d_model : (i + 1) * d_model]
        proj[name] = {"kernel": w.T.reshape(d_model, n_heads, head_dim),
                      "bias": b.reshape(n_heads, head_dim)}
    proj["out"] = {
        "kernel": np.asarray(get("self_attn.out_proj.weight")).T.reshape(
            n_heads, head_dim, d_model),
        "bias": np.asarray(get("self_attn.out_proj.bias")),
    }
    return {
        "MultiHeadDotProductAttention_0": proj,
        "LayerNorm_0": {"scale": np.asarray(get("norm1.weight")),
                        "bias": np.asarray(get("norm1.bias"))},
        "Dense_0": {"kernel": np.asarray(get("linear1.weight")).T,
                    "bias": np.asarray(get("linear1.bias"))},
        "Dense_1": {"kernel": np.asarray(get("linear2.weight")).T,
                    "bias": np.asarray(get("linear2.bias"))},
        "LayerNorm_1": {"scale": np.asarray(get("norm2.weight")),
                        "bias": np.asarray(get("norm2.bias"))},
    }


def _import_decoder(state, params) -> int:
    dec = params["decoder"]
    n = 0
    # recurrent stack (torch flat-parameter naming)
    if "RNNStack_0" in dec:
        stack = dec["RNNStack_0"]
        for layer_name in stack:
            # l{n}_{fwd,bwd}
            layer, direction = layer_name.split("_")
            suffix = "" if direction == "fwd" else "_reverse"
            idx = layer[1:]
            def getk(part, _idx=idx, _sfx=suffix):
                # reference names the module by cell type (decoders.py:36-62)
                for mod in ("gru", "lstm", "rnn"):
                    v = state.get(f"decoder.{mod}.{part}_l{_idx}{_sfx}")
                    if v is not None:
                        return v
                return None
            if getk("weight_ih") is None:
                raise ValueError(f"checkpoint lacks RNN weights for {layer_name}")
            stack[layer_name] = {
                "wi": getk("weight_ih").T, "wh": getk("weight_hh").T,
                "bi": getk("bias_ih"), "bh": getk("bias_hh"),
            }
            n += 4
    # transformer decoder (reference decoders.py:63-72: TransformerEncoder of
    # post-LN layers; the sin/cos PE is a buffer we recompute, not a weight)
    tf_layers = sorted(k for k in dec if k.startswith("TransformerEncoderLayer_"))
    for li, lname in enumerate(tf_layers):
        prefix = f"decoder.decoder_layer.layers.{li}."
        if prefix + "self_attn.in_proj_weight" not in state:
            raise ValueError(f"checkpoint lacks transformer weights for {lname}")
        d_model = state[prefix + "self_attn.in_proj_weight"].shape[1]
        n_heads = 8  # reference hard-codes nhead=8 (decoders.py:69)
        dec[lname] = transformer_layer_params(
            lambda name, _p=prefix: state[_p + name], d_model, n_heads)
        n += 16
    head_map = {
        "event_fc1": "event_fc_1", "event_fc2": "event_fc_2",
        "x_fc1": "x_fc_1", "x_fc2": "x_fc_2",
        "y_fc1": "y_fc_1", "y_fc2": "y_fc_2",
        "z_fc1": "z_fc_1", "z_fc2": "z_fc_2",
    }
    for ours, theirs in head_map.items():
        if ours in dec:
            w = state.get(f"decoder.{theirs}.weight")
            if w is None:
                raise ValueError(f"checkpoint lacks decoder.{theirs}")
            dec[ours] = {"kernel": w.T, "bias": state[f"decoder.{theirs}.bias"]}
            n += 2
    unmapped = set(dec) - {"RNNStack_0"} - set(head_map) - set(tf_layers)
    if unmapped:
        # refuse rather than silently leaving those modules at random init
        raise ValueError(
            f"cannot import weights for decoder modules {sorted(unmapped)}")
    return n


def torch_state_dict_to_flax(state: dict[str, np.ndarray], variables: dict):
    """Map a reference state_dict onto an initialized flax variables dict.

    variables: output of model.init (SeldNet with PannResNet22 + SeldDecoder).
    Returns (params, batch_stats) as plain nested dicts of np/jnp arrays.
    """
    import flax
    import jax.numpy as jnp

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    n_enc = _import_encoder(state, params, stats)
    n_dec = _import_decoder(state, params)
    if n_enc == 0 or n_dec == 0:
        raise ValueError("no weights imported — is this a reference checkpoint?")
    as_jnp = lambda t: jnp.asarray(np.asarray(t, dtype=np.float32))
    import jax

    return jax.tree.map(as_jnp, params), jax.tree.map(as_jnp, stats)
