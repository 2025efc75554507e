import os

import pytest

from salsa_tpu.utils.config import AttrDict, load_config, save_config, apply_overrides


def test_attrdict_nested_access():
    cfg = AttrDict({"a": {"b": {"c": 1}}, "lst": [{"x": 2}]})
    assert cfg.a.b.c == 1
    assert cfg.lst[0].x == 2
    cfg.a.b.c = 5
    assert cfg["a"]["b"]["c"] == 5
    with pytest.raises(AttributeError):
        _ = cfg.missing


def test_attrdict_get_and_to_dict():
    cfg = AttrDict({"a": {"b": 1}})
    assert cfg.get("nope", 7) == 7
    d = cfg.to_dict()
    assert type(d) is dict and type(d["a"]) is dict


def test_yaml_roundtrip(tmp_path):
    cfg = AttrDict({"name": "x", "data": {"fs": 24000, "list": [1, 2]}})
    p = str(tmp_path / "c.yml")
    save_config(cfg, p)
    loaded = load_config(p)
    assert loaded.data.fs == 24000 and loaded.data.list == [1, 2]


def test_apply_overrides():
    cfg = AttrDict({"training": {"lr": 1e-3}, "mode": "crossval"})
    apply_overrides(cfg, ["training.lr=3e-4", "mode=eval", "new.key=[1,2]",
                          "flag=true"])
    assert cfg.training.lr == 3e-4
    assert cfg.mode == "eval"
    assert cfg.new.key == [1, 2]
    assert cfg.flag is True
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no_equals_sign"])


CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("fname", sorted(os.listdir(CONFIG_DIR)))
def test_shipped_configs_are_valid(fname):
    """Every shipped experiment config parses and its names resolve against the
    live registries (feature bank, encoder/decoder zoo), with the encoder's
    input-channel count matching the feature type it names."""
    from salsa_tpu.features.registry import (
        FEATURE_REGISTRY, feature_n_channels)
    from salsa_tpu.models import build_model
    from salsa_tpu.models.encoders import ENCODERS
    from salsa_tpu.models.decoders import DECODERS

    cfg = load_config(os.path.join(CONFIG_DIR, fname))
    if "model" not in cfg:
        # feature-extraction data config (cli/extract.py surface)
        for key in ("data_dir", "feature_dir", "data"):
            assert key in cfg, f"{fname}: missing top-level key '{key}'"
        assert cfg.data.format in ("foa", "mic")
        assert cfg.data.fs > 0 and cfg.data.n_fft > 0 and cfg.data.hop_len > 0
        return
    for key in ("name", "feature_type", "data", "model", "training"):
        assert key in cfg, f"{fname}: missing top-level key '{key}'"
    assert cfg.feature_type in FEATURE_REGISTRY
    assert cfg.data.audio_format in ("foa", "mic")
    assert cfg.data.output_format in ("reg_xyz", "accdoa")

    enc = cfg.model.encoder
    dec = cfg.model.decoder
    assert enc.name in ENCODERS, f"{fname}: unknown encoder {enc.name}"
    assert dec.name in DECODERS, f"{fname}: unknown decoder {dec.name}"
    assert enc.n_input_channels == feature_n_channels(cfg.feature_type)
    # construction through the same registry path the train CLI uses
    build_model(encoder=enc.to_dict(), decoder=dec.to_dict(),
                n_classes=cfg.data.n_classes,
                output_format=cfg.data.output_format)

    sched = cfg.training.lr_scheduler
    assert len(sched.milestones) == len(sched.lrs) == len(sched.moms)
    assert sched.milestones == sorted(sched.milestones)
    if cfg.training.get("from_wav"):
        # fused mode must not point at a feature store
        assert cfg.get("feature_root_dir") in (None, "")
