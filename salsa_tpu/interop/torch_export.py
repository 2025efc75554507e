"""Export trained salsa_tpu (flax) weights as a reference-compatible PyTorch
checkpoint — the inverse of interop/torch_ckpt.py.

A model trained here (on TPU) becomes a `.ckpt` whose state_dict loads
*strictly* into the reference's torch modules (`SeldModel(encoder, decoder)`
attribute layout: reference experiments/train.py builds
`encoder.*` / `decoder.*` keys), so TPU-trained weights deploy straight into
the existing torch serving stack — or round-trip back through
cli/import_ckpt.py.

Name generation is structural, mirroring the reference's module tree:
  * encoder: `conv_block1.{conv1,bn1,conv2,bn2}` then
    `resnet.layer{L}.{i}.{conv1,bn1,conv2,bn2}` per basic block plus its
    `downsample` Sequential — index offset 1 when stride==2 because
    `downsample.0` is the (parameterless) AvgPool2d
    (reference models/model_utils.py:466-481);
  * decoder: torch flat RNN parameters `weight_ih_l{n}[_reverse]` (cell type
    inferred from the gate count: 3=GRU, 4=LSTM), transformer layers under
    `decoder_layer.layers.{i}.*`, and the SED/DOA head Linears
    (reference models/decoders.py:75-92).

Every sub-mapping inverts one proven by the import tests; the export itself is
verified end-to-end by tests/test_interop.py (strict torch load_state_dict +
forward parity + import round-trip).
"""
from __future__ import annotations

import numpy as np

from salsa_tpu.interop.torch_ckpt import _flax_encoder_paths

_HEAD_MAP = {
    "event_fc1": "event_fc_1", "event_fc2": "event_fc_2",
    "x_fc1": "x_fc_1", "x_fc2": "x_fc_2",
    "y_fc1": "y_fc_1", "y_fc2": "y_fc_2",
    "z_fc1": "z_fc_1", "z_fc2": "z_fc_2",
}


def _get(tree: dict, path: tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node, dtype=np.float32)


def _torch_encoder_names(enc_params: dict,
                         layers: tuple[int, ...] = (2, 2, 2, 2)) -> list[str]:
    """Reference module names in the same order `_flax_encoder_paths` walks the
    flax tree (stem pairs, then each block's mains followed by its shortcut)."""
    names = ["conv_block1.conv1", "conv_block1.bn1",
             "conv_block1.conv2", "conv_block1.bn2"]
    trunk = enc_params["ResNetTrunk_0"]
    n_blocks = len([k for k in trunk if k.startswith("ResNetBasicBlock_")])
    if n_blocks != sum(layers):
        raise ValueError(
            f"trunk has {n_blocks} basic blocks, expected {sum(layers)} "
            f"for reference layers={list(layers)} — non-PannResNet22 encoders "
            "have no torch analog to export to")
    b = 0
    for stage, stage_blocks in enumerate(layers):
        for i in range(stage_blocks):
            base = f"resnet.layer{stage + 1}.{i}"
            for part in ("conv1", "bn1", "conv2", "bn2"):
                names.append(f"{base}.{part}")
            if f"Conv_2" in trunk[f"ResNetBasicBlock_{b}"]:
                # stride-2 stages (all but layer1) carry AvgPool2d at
                # downsample.0, so conv/bn sit at .1/.2 (model_utils.py:474-481)
                off = 1 if stage > 0 else 0
                names += [f"{base}.downsample.{off}",
                          f"{base}.downsample.{off + 1}"]
            b += 1
    return names


def _export_encoder(params: dict, stats: dict, out: dict) -> int:
    enc = params["encoder"]
    flax_paths = _flax_encoder_paths(enc)
    names = _torch_encoder_names(enc)
    if len(names) != len(flax_paths):
        raise ValueError(f"encoder walk mismatch: {len(names)} torch modules "
                         f"vs {len(flax_paths)} flax conv/bn paths")
    for (path, kind), name in zip(flax_paths, names):
        if kind == "conv":
            # flax HWIO -> torch OIHW
            out[f"encoder.{name}.weight"] = np.transpose(
                _get(enc, path + ("kernel",)), (3, 2, 0, 1))
        else:
            out[f"encoder.{name}.weight"] = _get(enc, path + ("scale",))
            out[f"encoder.{name}.bias"] = _get(enc, path + ("bias",))
            out[f"encoder.{name}.running_mean"] = _get(
                stats["encoder"], path + ("mean",))
            out[f"encoder.{name}.running_var"] = _get(
                stats["encoder"], path + ("var",))
            # strict torch load expects the BN step counter buffer
            out[f"encoder.{name}.num_batches_tracked"] = np.zeros((), np.int64)
    return len(names)


def _export_decoder(params: dict, out: dict) -> int:
    dec = params["decoder"]
    n = 0
    if "RNNStack_0" in dec:
        stack = dec["RNNStack_0"]
        first = next(iter(stack.values()))
        gates = first["wi"].shape[1] // first["wh"].shape[0]
        try:
            mod = {3: "gru", 4: "lstm"}[gates]
        except KeyError:
            raise ValueError(f"RNN stack has {gates} gates per cell — neither "
                             "GRU (3) nor LSTM (4)") from None
        for layer_name, p in stack.items():
            layer, direction = layer_name.split("_")
            sfx = "" if direction == "fwd" else "_reverse"
            idx = layer[1:]
            out[f"decoder.{mod}.weight_ih_l{idx}{sfx}"] = _get(p, ("wi",)).T
            out[f"decoder.{mod}.weight_hh_l{idx}{sfx}"] = _get(p, ("wh",)).T
            out[f"decoder.{mod}.bias_ih_l{idx}{sfx}"] = _get(p, ("bi",))
            out[f"decoder.{mod}.bias_hh_l{idx}{sfx}"] = _get(p, ("bh",))
            n += 4
    tf_layers = sorted(k for k in dec if k.startswith("TransformerEncoderLayer_"))
    if tf_layers:
        # the reference registers its sin/cos table as a buffer (`decoder.pe.pe`,
        # model_utils.py:284 via decoders.py:67: pos_len=2000, (1, C, T) layout);
        # we recompute it so strict torch loads see every expected key
        from salsa_tpu.models.layers import sinusoid_position_encoding

        d0 = dec[tf_layers[0]]["MultiHeadDotProductAttention_0"]
        d_model0 = np.asarray(d0["query"]["kernel"]).shape[0]
        out["decoder.pe.pe"] = sinusoid_position_encoding(2000, d_model0).T[None]
        n += 1
    for li, lname in enumerate(tf_layers):
        lp = dec[lname]
        prefix = f"decoder.decoder_layer.layers.{li}."
        att = lp["MultiHeadDotProductAttention_0"]
        d_model = att["query"]["kernel"].shape[0]
        # flax per-projection kernels (d_in, heads, head_dim) -> torch packed
        # rows [q; k; v]; exact inverse of transformer_layer_params
        out[prefix + "self_attn.in_proj_weight"] = np.concatenate(
            [_get(att[nm], ("kernel",)).reshape(d_model, d_model).T
             for nm in ("query", "key", "value")], axis=0)
        out[prefix + "self_attn.in_proj_bias"] = np.concatenate(
            [_get(att[nm], ("bias",)).reshape(d_model)
             for nm in ("query", "key", "value")], axis=0)
        out[prefix + "self_attn.out_proj.weight"] = _get(
            att["out"], ("kernel",)).reshape(d_model, d_model).T
        out[prefix + "self_attn.out_proj.bias"] = _get(att["out"], ("bias",))
        for ln, tname in (("LayerNorm_0", "norm1"), ("LayerNorm_1", "norm2")):
            out[prefix + f"{tname}.weight"] = _get(lp[ln], ("scale",))
            out[prefix + f"{tname}.bias"] = _get(lp[ln], ("bias",))
        for dn, tname in (("Dense_0", "linear1"), ("Dense_1", "linear2")):
            out[prefix + f"{tname}.weight"] = _get(lp[dn], ("kernel",)).T
            out[prefix + f"{tname}.bias"] = _get(lp[dn], ("bias",))
        n += 16
    for ours, theirs in _HEAD_MAP.items():
        if ours in dec:
            out[f"decoder.{theirs}.weight"] = _get(dec[ours], ("kernel",)).T
            out[f"decoder.{theirs}.bias"] = _get(dec[ours], ("bias",))
            n += 2
    unmapped = set(dec) - {"RNNStack_0"} - set(_HEAD_MAP) - set(tf_layers)
    if unmapped:
        # refuse rather than silently dropping trained weights from the export
        raise ValueError(
            f"cannot export decoder modules {sorted(unmapped)} — no torch analog")
    return n


def flax_to_torch_state_dict(params: dict, batch_stats: dict
                             ) -> dict[str, np.ndarray]:
    """Map trained flax (params, batch_stats) onto a reference-named state_dict
    of float32 numpy arrays (keys `encoder.*` / `decoder.*`)."""
    out: dict[str, np.ndarray] = {}
    n_enc = _export_encoder(params, batch_stats, out)
    n_dec = _export_decoder(params, out)
    if n_enc == 0 or n_dec == 0:
        raise ValueError("nothing exported — is this a SeldNet parameter tree?")
    return out


def save_torch_checkpoint(path: str, state_dict: dict[str, np.ndarray],
                          metadata: dict | None = None) -> str:
    """Write a Lightning-style checkpoint (`{"state_dict": {"model.<k>": tensor}}`,
    the shape reference pl.Trainer checkpoints take) that torch.load(...,
    weights_only=True) reads back. torch is only needed for serialization."""
    import torch

    # copy=True: exported arrays may be read-only numpy views of jax buffers
    blob = {"state_dict": {f"model.{k}": torch.from_numpy(np.array(v, copy=True))
                           for k, v in state_dict.items()}}
    if metadata:
        blob["salsa_tpu_export"] = dict(metadata)
    torch.save(blob, path)
    return path
