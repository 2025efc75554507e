"""Parity tests whose right-hand side is the IMPORTED reference implementation
(/root/reference), not a transcription of it (VERDICT r01 item #3).

The reference's feature extractors are imported with a librosa/fire shim
(tests/ref_import.py); the shim's stft primitive is itself validated here against
torch.stft (an independent implementation), so any disagreement these tests catch
is in real reference logic — filter construction, channel ordering, eigenvector
normalization, chunk indexing — not in a re-stated oracle.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from salsa_tpu.features.registry import make_extractor
from salsa_tpu.features.salsa import SalsaParams, extract_salsa
from tests.ref_import import load_reference_module, _shim_stft

FS = 24000
NFFT = 512
HOP = 300
N_SAMPLES = FS  # 1 s -> 81 frames


@pytest.fixture(scope="module")
def ref_fe():
    m = load_reference_module("dataset.feature_extraction")
    if m is None:
        pytest.skip("reference repo not available")
    return m


@pytest.fixture(scope="module")
def ref_salsa():
    m = load_reference_module("dataset.salsa_feature_extraction")
    if m is None:
        pytest.skip("reference repo not available")
    return m


@pytest.fixture(scope="module")
def ref_db():
    m = load_reference_module("dataset.database")
    if m is None:
        pytest.skip("reference repo not available")
    return m


def directional_audio(rng, n_samples=None, n_ch=4, fs=FS):
    """Directional narrowband bursts + noise (valid and invalid SALSA TF bins)."""
    if n_samples is None:
        n_samples = N_SAMPLES if fs == FS else fs  # 1 s at non-native rates
    t = np.arange(n_samples) / fs
    x = 0.01 * rng.standard_normal((n_ch, n_samples))
    for f0, delay_per_ch, amp in [(440.0, 1e-4, 1.0), (1320.0, -7e-5, 0.6),
                                  (3100.0, 4e-5, 0.4)]:
        burst = np.zeros(n_samples)
        burst[n_samples // 4 : 3 * n_samples // 4] = 1.0
        for c in range(n_ch):
            x[c] += amp * np.sin(2 * np.pi * f0 * (t - c * delay_per_ch)) * burst
    return x.astype(np.float32)


# ---------------------------------------------------------------------------
# shim validation: the only substituted primitive must match an independent stft
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("n_fft,win_length,hop", [(512, 512, 300), (1024, 512, 300),
                                                  (256, 256, 150)])
def test_librosa_shim_stft_matches_torch(rng, n_fft, win_length, hop):
    import torch

    y = rng.standard_normal(6000).astype(np.float64)
    got = _shim_stft(y, n_fft=n_fft, hop_length=hop, win_length=win_length,
                     center=True, pad_mode="reflect")
    ref = torch.stft(
        torch.from_numpy(y), n_fft=n_fft, hop_length=hop, win_length=win_length,
        window=torch.hann_window(win_length, periodic=True, dtype=torch.float64),
        center=True, pad_mode="reflect", return_complex=True,
    ).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-10)


# ---------------------------------------------------------------------------
# SALSA: spectrogram + eigenvector channels vs the imported reference hot loop
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("audio_format", ["foa", "mic"])
def test_salsa_matches_imported_reference(rng, ref_salsa, audio_format):
    x = directional_audio(rng)
    fmax_doa = 9000.0 if audio_format == "foa" else 4000.0
    params = SalsaParams(fs=FS, n_fft=NFFT, hop_length=HOP, win_length=NFFT,
                         fmax_doa=fmax_doa, audio_format=audio_format,
                         eig_method="eigh")
    feat = np.asarray(extract_salsa(jnp.asarray(x), params))

    # spectrogram channels vs MagStftExtractor (reference salsa CLI path)
    mag = ref_salsa.MagStftExtractor(n_fft=NFFT, hop_length=HOP)
    spec_ref = mag.extract(x.astype(np.float32))
    np.testing.assert_allclose(feat[:4], spec_ref, atol=2e-2, rtol=1e-3)

    # eigenvector channels vs extract_normalized_eigenvector (the hot loop itself)
    X = np.stack([_shim_stft(x[c], n_fft=NFFT, hop_length=HOP, win_length=NFFT)
                  for c in range(4)], axis=-1)  # (bins, frames, 4)
    band = X[params.lower_bin : params.upper_bin]
    ref = ref_salsa.extract_normalized_eigenvector(
        band, condition_number=5.0, n_hopframes=3, is_tracking=True,
        audio_format=audio_format, fs=FS, n_fft=NFFT, lower_bin=params.lower_bin,
    )  # (3, bins, frames)
    n_band = params.upper_bin - params.lower_bin
    got = np.transpose(feat[4:, :, :n_band], (0, 2, 1))

    ref_mask = np.any(ref != 0, axis=0)
    got_mask = np.any(got != 0, axis=0)
    disagree = np.mean(ref_mask != got_mask)
    assert disagree < 0.01, f"validity masks disagree on {disagree:.2%} of TF bins"
    both = ref_mask & got_mask
    np.testing.assert_allclose(got[:, both], ref[:, both], atol=5e-3, rtol=1e-2)
    assert np.all(feat[4:, :, n_band:] == 0)


# ---------------------------------------------------------------------------
# classic feature bank vs the imported reference extractor classes
# ---------------------------------------------------------------------------
def test_melspec_matches_imported_reference(rng, ref_fe):
    x = directional_audio(rng)
    ex = make_extractor("melspec", "foa", fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128)
    ref = ref_fe.MelSpecExtractor(fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128)
    np.testing.assert_allclose(np.asarray(ex(x)), ref.extract(x), atol=2e-2, rtol=1e-3)


def test_melspeciv_matches_imported_reference(rng, ref_fe):
    x = directional_audio(rng)
    ex = make_extractor("melspeciv", "foa", fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128)
    ref = ref_fe.MelSpecIvExtractor(fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128)
    got, want = np.asarray(ex(x)), ref.extract(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[:4], want[:4], atol=2e-2, rtol=1e-3)  # dB specs
    np.testing.assert_allclose(got[4:], want[4:], atol=1e-3, rtol=1e-2)  # IV


def test_melspecgcc_matches_imported_reference(rng, ref_fe):
    x = directional_audio(rng)
    ex = make_extractor("melspecgcc", "mic", fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128)
    ref = ref_fe.MelSpecGccExtractor(fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128)
    got, want = np.asarray(ex(x)), ref.extract(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[:4], want[:4], atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(got[4:], want[4:], atol=2e-3, rtol=1e-2)  # GCC lags


def test_linspeciv_matches_imported_reference(rng, ref_fe):
    x = directional_audio(rng)
    ex = make_extractor("linspeciv", "foa", fs=FS, n_fft=NFFT, hop_length=HOP)
    ref = ref_fe.LinSpecIvExtractor(n_fft=NFFT, hop_length=HOP)
    got, want = np.asarray(ex(x)), ref.extract(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[:4], want[:4], atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(got[4:], want[4:], atol=1e-3, rtol=1e-2)


def test_linspecgcc_matches_imported_reference(rng, ref_fe):
    x = directional_audio(rng)
    ex = make_extractor("linspecgcc", "mic", fs=FS, n_fft=NFFT, hop_length=HOP)
    ref = ref_fe.LogSpecGccExtractor(n_fft=NFFT, hop_length=HOP)
    got, want = np.asarray(ex(x)), ref.extract(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[:4], want[:4], atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(got[4:], want[4:], atol=2e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# chunk indexing vs the imported reference Database method
# ---------------------------------------------------------------------------
def test_chunk_starts_match_imported_reference(ref_db):
    from types import SimpleNamespace

    from salsa_tpu.data.database import chunk_starts

    for n_frames, chunk, hop in [(4800, 640, 40), (4800, 640, 640), (1280, 640, 40),
                                 (643, 640, 40), (640, 640, 40), (4807, 640, 41)]:
        for downsample in (1, 8):
            if n_frames % downsample or chunk % downsample or hop % downsample:
                continue
            ns = SimpleNamespace(chunk_len=chunk, chunk_hop_len=hop)
            want, want_ptr = ref_db.Database.get_segment_idxes(
                ns, n_frames, downsample, pointer=17)
            got = chunk_starts(n_frames // downsample, chunk // downsample,
                               hop // downsample, offset=17)
            assert list(got) == list(want), (n_frames, chunk, hop, downsample)
            assert want_ptr == 17 + n_frames // downsample


# ---------------------------------------------------------------------------
# label-coupled channel-swap augmentations vs the imported reference transforms
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_tf():
    m = load_reference_module("utilities.transforms")
    if m is None:
        pytest.skip("reference repo not available")
    return m


def _draw_mask(seed, size):
    np.random.seed(seed)
    return np.random.randint(2, size=(size,))


def test_foa_swap_matches_imported_reference(rng, ref_tf):
    from salsa_tpu.data.transforms import swap_channel_foa

    t = ref_tf.TfmapRandomSwapChannelFoa(n_classes=4)
    for seed in range(16):
        x = rng.standard_normal((7, 6, 5)).astype(np.float32)
        sed = (rng.random((9, 4)) < 0.4).astype(np.float32)
        doa = rng.standard_normal((9, 12)).astype(np.float32)
        m = _draw_mask(seed, 4)
        np.random.seed(seed)  # ref draws the same m internally
        rx, rs, rd = t.apply(x.copy(), sed.copy(), doa.copy())
        gx, gs, gd = swap_channel_foa(x, sed, doa, m, 4)
        np.testing.assert_array_equal(gx, rx, err_msg=f"features, m={m}")
        np.testing.assert_array_equal(gd, rd, err_msg=f"labels, m={m}")


def test_mic_swap_matches_imported_reference(rng, ref_tf):
    from salsa_tpu.data.transforms import swap_channel_mic

    t = ref_tf.TfmapRandomSwapChannelMic(n_classes=4)
    for seed in range(16):
        x = rng.standard_normal((7, 6, 5)).astype(np.float32)
        sed = (rng.random((9, 4)) < 0.4).astype(np.float32)
        doa = rng.standard_normal((9, 12)).astype(np.float32)
        m = _draw_mask(seed, 3)
        np.random.seed(seed)
        rx, rs, rd = t.apply(x.copy(), sed.copy(), doa.copy())
        gx, gs, gd = swap_channel_mic(x, sed, doa, m, 4)
        np.testing.assert_allclose(gx, rx, atol=1e-6, err_msg=f"features, m={m}")
        np.testing.assert_allclose(gd, rd, atol=1e-6, err_msg=f"labels, m={m}")


def test_gcc_swap_matches_imported_reference(rng, ref_tf):
    """Features must match for every mask. Labels compared only when at most one
    generator fires: the reference desynchronizes features (if/elif) from labels
    (if/if/if) for multi-bit masks — we intentionally keep labels consistent with
    features (documented deviation, data/transforms.py)."""
    from salsa_tpu.data.transforms import swap_channel_gcc

    t = ref_tf.GccRandomSwapChannelMic(n_classes=4)
    for seed in range(24):
        x = rng.standard_normal((10, 6, 5)).astype(np.float32)
        sed = (rng.random((9, 4)) < 0.4).astype(np.float32)
        doa = rng.standard_normal((9, 12)).astype(np.float32)
        m = _draw_mask(seed, 3)
        np.random.seed(seed)
        rx, rs, rd = t.apply(x.copy(), sed.copy(), doa.copy())
        gx, gs, gd = swap_channel_gcc(x, sed, doa, m, 4)
        np.testing.assert_allclose(gx, rx, atol=1e-6, err_msg=f"features, m={m}")
        if m.sum() <= 1:
            np.testing.assert_allclose(gd, rd, atol=1e-6, err_msg=f"labels, m={m}")
