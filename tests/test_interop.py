"""End-to-end torch-checkpoint import: a (randomized) reference SeldModel-style
checkpoint on disk -> salsa_tpu flax params via interop/torch_ckpt.py -> forward
pass equality with the torch original (eval mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from salsa_tpu.models.seld import build_model
from tests.torch_ref import load_reference_models

torch = pytest.importorskip("torch")


@pytest.mark.slow
@pytest.mark.parametrize("decoder_type", ["bigru", "transformer"])
def test_torch_checkpoint_roundtrip(tmp_path, rng, decoder_type):
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")

    class Container(torch.nn.Module):  # mimics reference SeldModel attribute layout
        def __init__(self):
            super().__init__()
            self.encoder = ref.encoders.PannResNet22(n_input_channels=7)
            self.decoder = ref.decoders.SeldDecoder(
                n_output_channels=512, n_classes=5, output_format="reg_xyz",
                decoder_type=decoder_type, decoder_size=32, freq_pool="avg")

    t_model = Container()
    t_model.eval()
    with torch.no_grad():
        for p in t_model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        for m in t_model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.02)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)

    ckpt_path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": {("model." + k): v  # Lightning-style prefix
                               for k, v in t_model.state_dict().items()}}, ckpt_path)

    from salsa_tpu.interop import load_torch_state_dict, torch_state_dict_to_flax

    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": decoder_type,
                 "decoder_size": 32, "freq_pool": "avg"},
        n_classes=5)
    x = rng.standard_normal((2, 7, 64, 32)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    state = load_torch_state_dict(ckpt_path)
    params, stats = torch_state_dict_to_flax(state, variables)

    with torch.no_grad():
        enc = t_model.encoder(torch.from_numpy(x))
        t_out = t_model.decoder(enc)
    j_out = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(j_out["event_frame_logit"]),
                               t_out["event_frame_logit"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_out["doa_frame_output"]),
                               t_out["doa_frame_output"].numpy(),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_import_checkpoint_cli(tmp_path, rng):
    """CLI-level import: reference .ckpt -> experiment tree best.msgpack that
    restore_checkpoint round-trips."""
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")
    import yaml

    enc = ref.encoders.PannResNet22(n_input_channels=7)
    dec = ref.decoders.SeldDecoder(n_output_channels=512, n_classes=5,
                                   output_format="reg_xyz", decoder_type="bigru",
                                   decoder_size=32, freq_pool="avg")
    state_dict = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec)):
        for k, v in mod.state_dict().items():
            state_dict[f"{prefix}.{k}"] = v
    ckpt_path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": state_dict}, ckpt_path)

    exp_cfg = {
        "name": "imp", "feature_root_dir": str(tmp_path), "feature_type": "salsa",
        "gt_meta_root_dir": str(tmp_path), "seed": 0, "mode": "crossval",
        "data": {"fs": 24000, "n_fft": 512, "hop_len": 300, "audio_format": "foa",
                 "label_rate": 10, "train_chunk_len_s": 8,
                 "train_chunk_hop_len_s": 0.5, "test_chunk_len_s": 60.0,
                 "test_chunk_hop_len_s": 60.1, "n_classes": 5,
                 "output_format": "reg_xyz"},
        "model": {
            "encoder": {"name": "PannResNet22", "n_input_channels": 7},
            "decoder": {"name": "SeldDecoder", "decoder_type": "bigru",
                        "decoder_size": 32, "freq_pool": "avg"},
        },
        "training": {"train_batch_size": 8, "max_epochs": 1,
                     "lr_scheduler": {"milestones": [0, 1], "lrs": [1e-3, 1e-3],
                                      "moms": [0.9, 0.9]}},
        "sed_threshold": 0.3, "doa_threshold": 20, "eval_version": "2021",
    }
    cfg_path = tmp_path / "exp.yml"
    cfg_path.write_text(yaml.safe_dump(exp_cfg))

    from salsa_tpu.cli.import_ckpt import import_checkpoint
    from salsa_tpu.train import checkpoint as ckpt_mod

    out = import_checkpoint(str(cfg_path), ckpt_path,
                            exp_group_dir=str(tmp_path / "outputs"),
                            exp_suffix="_imp")
    assert out.endswith("best.msgpack")
    meta = ckpt_mod.load_metadata(out)
    assert meta["imported_from"] == ckpt_path

    # the written checkpoint restores into a fresh train state
    from salsa_tpu.models.seld import build_model
    from salsa_tpu.train.state import create_train_state, make_optimizer

    model = build_model(encoder=exp_cfg["model"]["encoder"],
                        decoder=exp_cfg["model"]["decoder"], n_classes=5)
    st = create_train_state(model, jnp.zeros((1, 7, 64, 16)), make_optimizer(1), seed=1)
    st = ckpt_mod.restore_checkpoint(out, st)
    # spot-check one transplanted weight equals the torch original
    w = np.asarray(st.params["decoder"]["event_fc2"]["kernel"])
    np.testing.assert_allclose(w, dec.event_fc_2.weight.detach().numpy().T, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("decoder_type", ["bigru", "transformer"])
def test_export_loads_strict_into_reference_torch(tmp_path, rng, decoder_type):
    """flax -> torch export: the state_dict loads with strict=True into the
    reference's own modules and the torch forward matches the flax forward."""
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")

    from salsa_tpu.interop import flax_to_torch_state_dict, save_torch_checkpoint

    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": decoder_type,
                 "decoder_size": 32, "freq_pool": "avg"},
        n_classes=5)
    x = rng.standard_normal((2, 7, 64, 32)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x), train=False)
    # non-trivial batch stats so running-stat export is actually exercised
    # (means ~1 +- noise, variances positive)
    stats = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(np.float32)
                              * 0.05 + 1.0),
        variables["batch_stats"])
    params = variables["params"]

    sd = flax_to_torch_state_dict(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, stats))
    ckpt_path = str(tmp_path / "exported.ckpt")
    save_torch_checkpoint(ckpt_path, sd, {"note": "test"})

    t_model = torch.nn.Module()
    t_model.encoder = ref.encoders.PannResNet22(n_input_channels=7)
    t_model.decoder = ref.decoders.SeldDecoder(
        n_output_channels=512, n_classes=5, output_format="reg_xyz",
        decoder_type=decoder_type, decoder_size=32, freq_pool="avg")
    blob = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    stripped = {k[len("model."):]: v for k, v in blob["state_dict"].items()}
    t_model.load_state_dict(stripped, strict=True)
    t_model.eval()

    with torch.no_grad():
        enc = t_model.encoder(torch.from_numpy(x))
        t_out = t_model.decoder(enc)
    j_out = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(j_out["event_frame_logit"]),
                               t_out["event_frame_logit"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_out["doa_frame_output"]),
                               t_out["doa_frame_output"].numpy(),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("decoder_type", ["bigru", "lstm"])
def test_export_import_roundtrip_identical(rng, tmp_path, decoder_type):
    """export -> import returns the exact parameter tree (no reference needed:
    the roundtrip is a pure algebra check on the two mappings)."""
    from salsa_tpu.interop import (flax_to_torch_state_dict,
                                   torch_state_dict_to_flax)

    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 4},
        decoder={"name": "SeldDecoder", "decoder_type": decoder_type,
                 "decoder_size": 16, "freq_pool": "avg"},
        n_classes=3)
    x = jnp.asarray(rng.standard_normal((1, 4, 32, 16)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = flax_to_torch_state_dict(params, stats)
    params2, stats2 = torch_state_dict_to_flax(sd, variables)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0] + \
        jax.tree_util.tree_flatten_with_path(stats)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(params2)[0] + \
        jax.tree_util.tree_flatten_with_path(stats2)[0]
    assert len(flat1) == len(flat2)
    for (path1, a), (path2, b) in zip(flat1, flat2):
        assert path1 == path2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path1))


@pytest.mark.slow
def test_import_then_export_cli_recovers_original_state_dict(tmp_path, rng):
    """Full circle at the CLI layer: reference .ckpt -> salsa-import-ckpt ->
    experiment msgpack -> salsa-export-ckpt -> tensors equal the original."""
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")
    import yaml

    enc = ref.encoders.PannResNet22(n_input_channels=7)
    dec = ref.decoders.SeldDecoder(n_output_channels=512, n_classes=5,
                                   output_format="reg_xyz", decoder_type="bigru",
                                   decoder_size=32, freq_pool="avg")
    with torch.no_grad():
        for mod in (enc, dec):
            for p in mod.parameters():
                p.copy_(torch.randn_like(p) * 0.05)
    state_dict = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec)):
        for k, v in mod.state_dict().items():
            state_dict[f"{prefix}.{k}"] = v
    src = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": state_dict}, src)

    exp_cfg = {
        "name": "circle", "feature_root_dir": str(tmp_path),
        "feature_type": "salsa", "gt_meta_root_dir": str(tmp_path),
        "seed": 0, "mode": "crossval",
        "data": {"fs": 24000, "n_fft": 512, "hop_len": 300,
                 "audio_format": "foa", "label_rate": 10,
                 "train_chunk_len_s": 8, "train_chunk_hop_len_s": 0.5,
                 "test_chunk_len_s": 60.0, "test_chunk_hop_len_s": 60.1,
                 "n_classes": 5, "output_format": "reg_xyz"},
        "model": {
            "encoder": {"name": "PannResNet22", "n_input_channels": 7},
            "decoder": {"name": "SeldDecoder", "decoder_type": "bigru",
                        "decoder_size": 32, "freq_pool": "avg"},
        },
        "training": {"train_batch_size": 8, "max_epochs": 1,
                     "lr_scheduler": {"milestones": [0, 1],
                                      "lrs": [1e-3, 1e-3],
                                      "moms": [0.9, 0.9]}},
        "sed_threshold": 0.3, "doa_threshold": 20, "eval_version": "2021",
    }
    cfg_path = tmp_path / "exp.yml"
    cfg_path.write_text(yaml.safe_dump(exp_cfg))

    from salsa_tpu.cli.export_ckpt import export_checkpoint
    from salsa_tpu.cli.import_ckpt import import_checkpoint

    import_checkpoint(str(cfg_path), src,
                      exp_group_dir=str(tmp_path / "outputs"),
                      exp_suffix="_c")
    out = str(tmp_path / "exported.ckpt")
    export_checkpoint(str(cfg_path), out,
                      exp_group_dir=str(tmp_path / "outputs"), exp_suffix="_c")

    blob = torch.load(out, map_location="cpu", weights_only=True)
    got = {k[len("model."):]: v.numpy() for k, v in blob["state_dict"].items()}
    assert set(got) == set(state_dict)
    for k, v in state_dict.items():
        np.testing.assert_allclose(got[k], v.numpy(), atol=1e-6,
                                   err_msg=k)


def test_export_cli_refuses_tpu_stem_encoder(tmp_path):
    """PannResNet22TPU shares the parameter tree but pools before the stem —
    exporting it would silently deploy a different function into torch."""
    import yaml

    cfg = {
        "name": "tpu_stem", "feature_root_dir": str(tmp_path),
        "feature_type": "salsa", "gt_meta_root_dir": str(tmp_path),
        "seed": 0, "mode": "crossval",
        "data": {"fs": 24000, "n_fft": 512, "hop_len": 300,
                 "audio_format": "foa", "label_rate": 10,
                 "train_chunk_len_s": 8, "train_chunk_hop_len_s": 0.5,
                 "test_chunk_len_s": 60.0, "test_chunk_hop_len_s": 60.1,
                 "n_classes": 5, "output_format": "reg_xyz"},
        "model": {
            "encoder": {"name": "PannResNet22TPU", "n_input_channels": 7},
            "decoder": {"name": "SeldDecoder", "decoder_type": "bigru",
                        "decoder_size": 32, "freq_pool": "avg"},
        },
        "training": {"train_batch_size": 8, "max_epochs": 1,
                     "lr_scheduler": {"milestones": [0, 1],
                                      "lrs": [1e-3, 1e-3],
                                      "moms": [0.9, 0.9]}},
        "sed_threshold": 0.3, "doa_threshold": 20, "eval_version": "2021",
    }
    cfg_path = tmp_path / "exp.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from salsa_tpu.cli.export_ckpt import export_checkpoint

    with pytest.raises(ValueError, match="PannResNet22TPU"):
        export_checkpoint(str(cfg_path), str(tmp_path / "out.ckpt"),
                          exp_group_dir=str(tmp_path / "outputs"),
                          exp_suffix="_x")


def test_export_refuses_unknown_decoder_modules(rng):
    """Unmappable modules raise instead of silently dropping trained weights."""
    from salsa_tpu.interop import flax_to_torch_state_dict

    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 4},
        decoder={"name": "SeldDecoder", "decoder_type": "gru",
                 "decoder_size": 16, "freq_pool": "avg"},
        n_classes=3)
    x = jnp.asarray(rng.standard_normal((1, 4, 32, 16)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    params["decoder"]["mystery_head"] = {"kernel": np.zeros((4, 4), np.float32)}
    with pytest.raises(ValueError, match="mystery_head"):
        flax_to_torch_state_dict(params, stats)


class NotATensor:  # module-level so pickle can serialize it
    pass


def test_load_rejects_unsafe_pickle_without_trust(tmp_path):
    """Checkpoints needing full unpickling are refused unless trust_checkpoint
    is set (ADVICE r2: weights_only=True by default)."""
    import pickle

    from salsa_tpu.interop import load_torch_state_dict

    path = tmp_path / "evil.ckpt"
    with open(path, "wb") as f:
        pickle.dump({"state_dict": {"model.w": NotATensor()}}, f)
    with pytest.raises(ValueError, match="trust_checkpoint"):
        load_torch_state_dict(str(path))


def test_load_plain_state_dict_weights_only(tmp_path):
    """A plain tensor state_dict loads through the safe path (no trust flag)."""
    from salsa_tpu.interop import load_torch_state_dict

    path = str(tmp_path / "plain.ckpt")
    torch.save({"state_dict": {"model.w": torch.ones(3)}}, path)
    out = load_torch_state_dict(path)
    np.testing.assert_array_equal(out["w"], np.ones(3, np.float32))
