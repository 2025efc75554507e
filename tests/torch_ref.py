"""Helpers to load the reference (PyTorch) model code as a numerical oracle.

The reference package imports pytorch_lightning (not installed here), so we stub the
handful of symbols its import graph touches before loading the modules we need.
"""
from __future__ import annotations

import os
import sys
import types

REF = "/root/reference"


def load_reference_models():
    if not os.path.isdir(REF):
        return None
    import numpy as np

    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001 — reference targets numpy<1.20
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class _Stub:
            def __init__(self, *a, **k):
                pass

        pl.LightningModule = _Stub
        pl.LightningDataModule = _Stub
        pl.Callback = _Stub
        pl.seed_everything = lambda *a, **k: None
        sys.modules["pytorch_lightning"] = pl
    if "IPython" not in sys.modules:
        ip = types.ModuleType("IPython")
        ip.embed = lambda *a, **k: None
        sys.modules["IPython"] = ip
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    mu = importlib.import_module("models.model_utils")
    enc = importlib.import_module("models.encoders")
    dec = importlib.import_module("models.decoders")
    try:
        itf = importlib.import_module("models.interfaces")
    except Exception:  # heavier import graph (metrics, h5py); optional
        itf = None
    return types.SimpleNamespace(model_utils=mu, encoders=enc, decoders=dec,
                                 interfaces=itf)
