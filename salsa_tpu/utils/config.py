"""Config handling: YAML -> attribute-accessible dict.

Mirrors the reference's two-tier config system (YAML files + CLI overrides,
reference: utilities/experiments_utils.py:27-34) without the munch/fire deps.
"""
from __future__ import annotations

import copy
from typing import Any, Mapping

import yaml


class AttrDict(dict):
    """dict subclass with attribute access, recursively wrapping nested mappings."""

    def __init__(self, mapping: Mapping | None = None, **kwargs):
        super().__init__()
        if mapping:
            for k, v in mapping.items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, Mapping) and not isinstance(value, AttrDict):
            value = AttrDict(value)
        elif isinstance(value, list):
            value = [AttrDict(v) if isinstance(v, Mapping) else v for v in value]
        super().__setitem__(key, value)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, AttrDict):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, AttrDict) else x for x in v]
            else:
                out[k] = v
        return out


def load_config(path: str) -> AttrDict:
    """Load a YAML config file into an AttrDict."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    return AttrDict(cfg or {})


def save_config(cfg: AttrDict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict() if isinstance(cfg, AttrDict) else cfg, f, sort_keys=False)


def apply_overrides(cfg: AttrDict, overrides: list[str]) -> AttrDict:
    """Apply 'dotted.key=value' CLI overrides in place; values parsed as YAML."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        if not _:
            raise ValueError(f"override '{ov}' must look like key=value")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node:
                node[p] = AttrDict()
            node = node[p]
        value = yaml.safe_load(raw)
        if isinstance(value, str):
            # YAML 1.1 only floats '3.0e-4', not '3e-4' — accept plain numerics too
            try:
                value = float(value) if any(c in value for c in ".eE") else int(value)
            except ValueError:
                pass
        node[parts[-1]] = value
    return cfg
