import numpy as np
import jax.numpy as jnp
import pytest

from salsa_tpu.dsp.filterbank import high_freq_compression_matrix, mel_filterbank
from salsa_tpu.features.salsa import SalsaParams, extract_salsa, salsa_eigenvector_features
from salsa_tpu.features.salsa_lite import SalsaLiteParams, extract_salsa_lite
from salsa_tpu.features.registry import make_extractor
from tests.oracles import (
    oracle_stft,
    oracle_power_to_db,
    oracle_normalized_eigenvector,
    oracle_gcc_phat,
)

FS = 8000
NFFT = 256
HOP = 150


def make_multichannel_signal(rng, n_ch=4, n_samples=4000, fs=FS):
    """A couple of directional narrowband sources + noise: produces a healthy mix of
    valid and invalid TF bins for the SALSA coherence/tracking logic."""
    t = np.arange(n_samples) / fs
    x = 0.01 * rng.standard_normal((n_ch, n_samples))
    for f0, delay_per_ch, amp in [(440.0, 3e-4, 1.0), (1320.0, -2e-4, 0.6)]:
        burst = np.zeros(n_samples)
        burst[n_samples // 4 : 3 * n_samples // 4] = 1.0
        for c in range(n_ch):
            x[c] += amp * np.sin(2 * np.pi * f0 * (t - c * delay_per_ch)) * burst
    return x.astype(np.float32)


def oracle_salsa_spec(x, W):
    specs = []
    for c in range(x.shape[0]):
        S = oracle_stft(x[c].astype(np.float64), NFFT, HOP)
        specs.append(oracle_power_to_db((W @ (np.abs(S) ** 2)).T))
    return np.stack(specs)


@pytest.mark.parametrize("audio_format", ["foa", "mic"])
def test_salsa_matches_loop_oracle(rng, audio_format):
    x = make_multichannel_signal(rng)
    params = SalsaParams(
        fs=FS, n_fft=NFFT, hop_length=HOP, win_length=NFFT,
        fmax_doa=2000.0, audio_format=audio_format, eig_method="eigh",
    )
    feat = np.asarray(extract_salsa(jnp.asarray(x), params))

    # spectrogram channels
    W = high_freq_compression_matrix(NFFT)
    spec_ref = oracle_salsa_spec(x, W)
    np.testing.assert_allclose(feat[:4], spec_ref, atol=1e-2, rtol=1e-3)

    # eigenvector channels vs per-bin loop oracle
    X = np.stack(
        [oracle_stft(x[c].astype(np.float64), NFFT, HOP) for c in range(4)], axis=-1
    )  # (bins, frames, 4)
    band = X[params.lower_bin : params.upper_bin]
    ref = oracle_normalized_eigenvector(
        band, audio_format=audio_format, fs=FS, n_fft=NFFT, lower_bin=params.lower_bin
    )  # (3, bins, frames)
    n_band = params.upper_bin - params.lower_bin
    got = np.transpose(feat[4:, :, :n_band], (0, 2, 1))  # (3, bins, frames)

    # masks must agree except possibly at exact-threshold ties
    ref_mask = np.any(ref != 0, axis=0)
    got_mask = np.any(got != 0, axis=0)
    disagree = np.mean(ref_mask != got_mask)
    assert disagree < 0.01, f"validity masks disagree on {disagree:.2%} of TF bins"

    both = ref_mask & got_mask
    np.testing.assert_allclose(got[:, both], ref[:, both], atol=5e-3, rtol=1e-2)

    # zero padding above the DOA band
    assert np.all(feat[4:, :, n_band:] == 0)


def test_salsa_power_iteration_close_to_eigh(rng):
    x = make_multichannel_signal(rng)
    p_eigh = SalsaParams(fs=FS, n_fft=NFFT, hop_length=HOP, fmax_doa=2000.0,
                         audio_format="foa", eig_method="eigh")
    p_pow = SalsaParams(fs=FS, n_fft=NFFT, hop_length=HOP, fmax_doa=2000.0,
                        audio_format="foa", eig_method="power", power_iters=30)
    a = np.asarray(extract_salsa(jnp.asarray(x), p_eigh))[4:]
    b = np.asarray(extract_salsa(jnp.asarray(x), p_pow))[4:]
    mask_a = np.any(a != 0, axis=0)
    mask_b = np.any(b != 0, axis=0)
    assert np.mean(mask_a != mask_b) < 0.02
    both = mask_a & mask_b
    np.testing.assert_allclose(b[:, both], a[:, both], atol=2e-2, rtol=5e-2)


def test_salsa_lite_matches_numpy(rng):
    x = make_multichannel_signal(rng)
    params = SalsaLiteParams(fs=FS, n_fft=NFFT, hop_length=HOP, win_length=NFFT,
                             fmax_doa=2000.0, fmax_spec=3500.0)
    feat = np.asarray(extract_salsa_lite(jnp.asarray(x), params))

    X = np.stack([oracle_stft(x[c].astype(np.float64), NFFT, HOP) for c in range(4)])
    log_specs = oracle_power_to_db(np.abs(X) ** 2).transpose(0, 2, 1)
    phase = np.angle(X[1:] * np.conj(X[0:1])).transpose(0, 2, 1)
    delta = 2 * np.pi * FS / (NFFT * 343.0)
    fv = np.arange(NFFT // 2 + 1, dtype=np.float64)
    fv[0] = 1
    phase = phase / (delta * fv[None, None, :])

    lb, ub, cb = params.lower_bin, params.upper_bin, params.cutoff_bin
    expect_spec = log_specs[:, :, lb:cb]
    expect_phase = phase[:, :, lb:cb].copy()
    raw_angle = np.angle(X[1:] * np.conj(X[0:1])).transpose(0, 2, 1)[:, :, lb:cb]
    expect_phase[:, :, ub - lb:] = 0.0

    np.testing.assert_allclose(feat[:4], expect_spec, atol=1e-2, rtol=1e-3)
    # exclude TF bins whose raw IPD sits at the ±pi wrap boundary: there float32 vs
    # float64 rounding legitimately flips the sign of the angle (the reference's
    # complex64 STFT has the same chaotic boundary)
    stable = np.abs(np.abs(raw_angle) - np.pi) > 1e-3
    stable[:, :, ub - lb:] = True
    np.testing.assert_allclose(feat[4:][stable], expect_phase[stable], atol=1e-3, rtol=1e-3)
    assert feat.shape == (7, X.shape[2], cb - lb)


def test_salsa_ipd_normalization(rng):
    x = make_multichannel_signal(rng)
    p = SalsaLiteParams(fs=FS, n_fft=NFFT, hop_length=HOP, fmax_doa=2000.0,
                        fmax_spec=3500.0, normalize="ipd")
    feat = np.asarray(extract_salsa_lite(jnp.asarray(x), p))
    ub = p.upper_bin - p.lower_bin
    assert np.all(np.abs(feat[4:, :, :ub]) <= 1.0 + 1e-6)  # angle/pi in [-1, 1]


def test_melspeciv_extractor(rng):
    x = make_multichannel_signal(rng)
    ex = make_extractor("melspeciv", "foa", fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=64)
    feat = np.asarray(ex(x))
    assert feat.shape[0] == 7 and feat.shape[2] == 64

    melW = mel_filterbank(FS, NFFT, 64, 50.0, FS // 2)
    X = np.stack([oracle_stft(x[c].astype(np.float64), NFFT, HOP) for c in range(4)])
    spec_ref = oracle_power_to_db(np.einsum("fb,cbt->ctf", melW.astype(np.float64), np.abs(X) ** 2))
    np.testing.assert_allclose(feat[:4], spec_ref, atol=1e-2, rtol=1e-3)

    iv = np.real(np.conj(X[0:1]) * X[1:4])
    norm = np.sqrt(np.sum(iv**2, axis=0, keepdims=True)) + 1e-8
    iv_ref = np.einsum("fb,cbt->ctf", melW.astype(np.float64), iv / norm)
    np.testing.assert_allclose(feat[4:], iv_ref, atol=1e-4, rtol=1e-3)


def test_linspecgcc_extractor(rng):
    x = make_multichannel_signal(rng)
    ex = make_extractor("linspecgcc", "mic", fs=FS, n_fft=NFFT, hop_length=HOP)
    feat = np.asarray(ex(x))
    n_freqs = 100
    assert feat.shape[0] == 10 and feat.shape[2] == n_freqs

    # pair (0,1) is channel 4; oracle: sig=ch1, ref=ch0
    ref01 = oracle_gcc_phat(x[1].astype(np.float64), x[0].astype(np.float64),
                            NFFT, HOP, NFFT, n_freqs)
    np.testing.assert_allclose(feat[4], ref01, atol=2e-3, rtol=1e-2)
    # pair (2,3) is the last channel
    ref23 = oracle_gcc_phat(x[3].astype(np.float64), x[2].astype(np.float64),
                            NFFT, HOP, NFFT, n_freqs)
    np.testing.assert_allclose(feat[9], ref23, atol=2e-3, rtol=1e-2)


def test_feature_shapes_all_types(rng):
    x = make_multichannel_signal(rng)
    for ft, fmt in [("salsa", "foa"), ("salsa", "mic"), ("salsa_lite", "mic"),
                    ("salsa_ipd", "mic"), ("linspeciv", "foa"), ("melspeciv", "foa"),
                    ("linspecgcc", "mic"), ("melspecgcc", "mic"), ("melspec", "foa")]:
        ex = make_extractor(ft, fmt, fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=64,
                            fmax_doa=2000.0)
        feat = np.asarray(ex(x))
        assert feat.shape[0] == ex.n_channels, (ft, feat.shape)
        assert feat.shape[2] == ex.n_features, (ft, feat.shape)
        assert np.all(np.isfinite(feat)), ft
