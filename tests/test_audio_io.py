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


def test_resample_preserves_tone(tmp_path):
    """Polyphase resampling (librosa.load(sr=fs) parity role): a 440 Hz tone
    resampled 16 kHz -> 24 kHz keeps its frequency and amplitude."""
    from salsa_tpu.utils.audio_io import resample

    t = np.arange(16000) / 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    y = resample(x, 16000, 24000)
    assert y.shape == (1, 24000) and y.dtype == np.float32
    spec = np.abs(np.fft.rfft(y[0]))
    assert abs(np.argmax(spec) * 24000 / 24000 - 440) <= 1  # bin width 1 Hz
    np.testing.assert_allclose(np.max(np.abs(y[0][1000:-1000])), 0.5, atol=0.01)


def test_resample_round_trip(tmp_path, rng):
    from salsa_tpu.utils.audio_io import resample

    # band-limit below the 12 kHz round-trip Nyquist so the trip is lossless
    x = rng.standard_normal((2, 24000)).astype(np.float32)
    spec = np.fft.rfft(x, axis=-1)
    spec[:, 8000:] = 0
    x = np.fft.irfft(spec, n=24000, axis=-1).astype(np.float32)
    y = resample(resample(x, 24000, 48000), 48000, 24000)
    np.testing.assert_allclose(y[:, 500:-500], x[:, 500:-500], atol=1e-2)
    assert np.sqrt(np.mean((y - x)[:, 500:-500] ** 2)) < 2e-3  # rms error


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_info_header_only(tmp_path, rng, bits):
    """wav_info must report (channels, samples, fs) without decoding, matching
    the full reader, and resampled_length must predict the post-resample
    length read_wav(target_fs=...) actually returns (cli/predict.py's
    --streaming bucketing relies on both)."""
    from salsa_tpu.utils.audio_io import resampled_length, wav_info

    x = (rng.standard_normal((4, 3217)) * 0.3).astype(np.float32)
    p = str(tmp_path / f"i{bits}.wav")
    write_wav(p, x, 16000, bits=bits)
    ch, n, fs = wav_info(p)
    assert (ch, n, fs) == (4, 3217, 16000)
    data, _ = read_wav(p, target_fs=24000)
    assert resampled_length(n, fs, 24000) == data.shape[1]
    assert resampled_length(n, fs, fs) == n


def test_read_wav_target_fs(tmp_path):
    from salsa_tpu.utils.audio_io import read_wav, write_wav

    t = np.arange(16000) / 16000
    x = (0.25 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None]
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000, bits=16)
    data, fs = read_wav(p, target_fs=24000)
    assert fs == 24000 and data.shape == (1, 24000)
    native, nfs = read_wav(p)
    assert nfs == 16000 and native.shape[1] == 16000
