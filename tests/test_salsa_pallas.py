"""The Pallas fused spatial kernel must reproduce the XLA path (same algorithm,
same numerics up to fp32 reassociation) — verified in interpreter mode on CPU."""
import numpy as np
import pytest
import jax.numpy as jnp

from salsa_tpu.features.salsa import (
    SalsaParams,
    noise_floor_mask,
    tracking_magspec,
    salsa_eigenvector_features,
)
from salsa_tpu.features.salsa_pallas import salsa_spatial_pallas
from tests.oracles import oracle_stft


def make_band(rng, n_bins=16, n_frames=700, audio="foa"):
    fs, nfft, hop = 8000, 256, 150
    n = (n_frames - 1) * hop
    t = np.arange(n) / fs
    x = 0.01 * rng.standard_normal((4, n))
    for f0, delay, amp in [(440.0, 3e-4, 1.0), (900.0, -2e-4, 0.5)]:
        burst = np.zeros(n)
        burst[n // 4 : 3 * n // 4] = 1.0
        for c in range(4):
            x[c] += amp * np.sin(2 * np.pi * f0 * (t - c * delay)) * burst
    X = np.stack([oracle_stft(x[c], nfft, hop) for c in range(4)], axis=-1)
    return X[1 : 1 + n_bins].astype(np.complex64)  # (bins, frames, 4)


@pytest.mark.parametrize("audio_format", ["foa", "mic"])
def test_pallas_kernel_matches_xla_path(rng, audio_format):
    X = make_band(rng)
    n_bins, n_frames, _ = X.shape
    h = 3

    params = SalsaParams(fs=8000, n_fft=256, hop_length=150, fmax_doa=2000.0,
                         audio_format=audio_format, eig_method="power")
    ref = np.asarray(salsa_eigenvector_features(jnp.asarray(X), params))

    Xpad = jnp.concatenate([jnp.asarray(X)[:, -h:], jnp.asarray(X), jnp.asarray(X)[:, :h]], axis=1)
    mag = tracking_magspec(Xpad, h, n_frames)
    mask = noise_floor_mask(mag)
    got = np.asarray(
        salsa_spatial_pallas(
            jnp.asarray(X), mask, n_hop=h, audio_format=audio_format,
            condition_number=5.0, lower_bin=params.lower_bin, fs=8000, n_fft=256,
            interpret=True,
        )
    )
    assert got.shape == ref.shape

    mask_ref = np.any(ref != 0, axis=0)
    mask_got = np.any(got != 0, axis=0)
    disagree = np.mean(mask_ref != mask_got)
    assert disagree < 0.005, f"validity masks disagree on {disagree:.2%}"
    both = mask_ref & mask_got
    np.testing.assert_allclose(got[:, both], ref[:, both], atol=5e-3, rtol=5e-3)


def test_planes_entry_matches_complex_entry(rng):
    # the planes-native entry (what extract_salsa/chunked feed) must equal the
    # complex wrapper bit-for-bit — same kernel, layout change only
    from salsa_tpu.features.salsa_pallas import salsa_spatial_pallas_planes

    X = make_band(rng, n_bins=11, n_frames=333)
    h = 3
    Xj = jnp.asarray(X)
    Xpad = jnp.concatenate([Xj[:, -h:], Xj, Xj[:, :h]], axis=1)
    mask = noise_floor_mask(tracking_magspec(Xpad, h, X.shape[1]))
    via_complex = np.asarray(
        salsa_spatial_pallas(Xj, mask, n_hop=h, audio_format="foa",
                             lower_bin=1, fs=8000, n_fft=256, interpret=True))
    xr = jnp.transpose(jnp.real(Xpad), (2, 0, 1))
    xi = jnp.transpose(jnp.imag(Xpad), (2, 0, 1))
    via_planes = np.asarray(
        salsa_spatial_pallas_planes(xr, xi, mask, n_hop=h, audio_format="foa",
                                    lower_bin=1, fs=8000, n_fft=256,
                                    interpret=True))
    np.testing.assert_array_equal(via_planes, via_complex)


def test_pallas_kernel_pads_and_crops(rng):
    # non-multiple bins/frames exercise the tile padding path
    X = make_band(rng, n_bins=11, n_frames=333)
    h = 3
    Xj = jnp.asarray(X)
    Xpad = jnp.concatenate([Xj[:, -h:], Xj, Xj[:, :h]], axis=1)
    mask = noise_floor_mask(tracking_magspec(Xpad, h, X.shape[1]))
    out = np.asarray(
        salsa_spatial_pallas(Xj, mask, n_hop=h, audio_format="foa",
                             lower_bin=1, fs=8000, n_fft=256, interpret=True)
    )
    assert out.shape == (3, 11, 333)
    assert np.all(np.isfinite(out))
