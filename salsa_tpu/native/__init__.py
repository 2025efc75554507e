"""Native (C++) fast paths, loaded via ctypes with transparent Python fallback.

`load_wavio()` returns a handle to the compiled WAV decoder, building it with g++ on
first use (cached next to the source). Callers must handle None (no toolchain)."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libwavio.so")
_SRC = os.path.join(_DIR, "wavio.cpp")
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_wavio():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_long,
        ]
        lib.wav_read_f32.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def read_wav_native(path: str):
    """Decode a WAV with the C++ decoder. Returns (data (C, N) float32, fs) or None
    if the native library is unavailable or the format unsupported."""
    lib = load_wavio()
    if lib is None:
        return None
    n_ch = ctypes.c_int()
    n_samp = ctypes.c_long()
    fs = ctypes.c_int()
    if lib.wav_info(path.encode(), ctypes.byref(n_ch), ctypes.byref(n_samp),
                    ctypes.byref(fs)) != 0:
        return None
    out = np.empty((n_ch.value, n_samp.value), dtype=np.float32)
    rc = lib.wav_read_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_ch.value, n_samp.value,
    )
    if rc != 0:
        return None
    return out, fs.value
