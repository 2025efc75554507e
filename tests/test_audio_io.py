import numpy as np
import pytest

from salsa_tpu.utils.audio_io import read_wav, _read_wav_py, write_wav


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_roundtrip_python(tmp_path, rng, bits):
    x = (rng.standard_normal((4, 1000)) * 0.3).clip(-0.99, 0.99).astype(np.float32)
    p = str(tmp_path / f"t{bits}.wav")
    write_wav(p, x, 24000, bits=bits)
    y, fs = _read_wav_py(p)
    assert fs == 24000 and y.shape == x.shape
    tol = {16: 1e-4, 24: 5e-7, 32: 1e-9}[bits]
    np.testing.assert_allclose(y, x, atol=tol)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_native_decoder_matches_python(tmp_path, rng, bits):
    from salsa_tpu.native import load_wavio, read_wav_native

    if load_wavio() is None:
        pytest.skip("native wavio unavailable (no toolchain)")
    x = (rng.standard_normal((4, 4321)) * 0.5).clip(-0.99, 0.99).astype(np.float32)
    p = str(tmp_path / f"n{bits}.wav")
    write_wav(p, x, 24000, bits=bits)
    got = read_wav_native(p)
    assert got is not None
    y, fs = got
    ref, fs_ref = _read_wav_py(p)
    assert fs == fs_ref == 24000
    np.testing.assert_allclose(y, ref, atol=1e-7)


def test_read_wav_dispatches(tmp_path, rng):
    x = (rng.standard_normal((2, 500)) * 0.3).astype(np.float32)
    p = str(tmp_path / "d.wav")
    write_wav(p, x, 16000, bits=16)
    y, fs = read_wav(p)
    assert fs == 16000 and y.shape == (2, 500)
