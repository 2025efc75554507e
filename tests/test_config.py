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
