"""In-graph augmentation must match the host (NumPy) augmentation algebra."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from salsa_tpu.data.transforms import swap_channel_foa, swap_channel_mic
from salsa_tpu.train import device_augment as da


@pytest.mark.parametrize("m", [(0, 0, 0, 0), (1, 0, 0, 0), (0, 1, 1, 0), (1, 1, 1, 1)])
def test_foa_swap_dev_matches_host(rng, m):
    x = rng.standard_normal((7, 5, 6)).astype(np.float32)
    doa = rng.standard_normal((5, 9)).astype(np.float32)
    sed = np.zeros((5, 3), np.float32)
    hx, _, hd = swap_channel_foa(x, sed, doa, np.array(m), 3)
    dx, dd = da.swap_channel_foa_dev(jnp.asarray(x), jnp.asarray(doa),
                                     jnp.asarray(m, jnp.float32), 3)
    np.testing.assert_allclose(np.asarray(dx), hx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dd), hd, atol=1e-6)


@pytest.mark.parametrize("m", [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)])
def test_mic_swap_dev_matches_host(rng, m):
    x = rng.standard_normal((7, 5, 6)).astype(np.float32)
    doa = rng.standard_normal((5, 9)).astype(np.float32)
    sed = np.zeros((5, 3), np.float32)
    hx, _, hd = swap_channel_mic(x, sed, doa, np.array(m), 3)
    dx, dd = da.swap_channel_mic_dev(jnp.asarray(x), jnp.asarray(doa),
                                     jnp.asarray(m, jnp.float32), 3)
    np.testing.assert_allclose(np.asarray(dx), hx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dd), hd, atol=1e-6)


@pytest.mark.parametrize("direction_up,shift", [(True, 3), (False, 3), (True, 9)])
def test_freq_shift_dev_matches_numpy(rng, direction_up, shift):
    x = rng.standard_normal((7, 4, 30)).astype(np.float32)
    got = np.asarray(da.freq_shift_dev(jnp.asarray(x), shift, direction_up, 10))
    if direction_up:
        expect = np.pad(x, ((0, 0), (0, 0), (shift, 0)), mode="reflect")[:, :, :30]
    else:
        expect = np.pad(x, ((0, 0), (0, 0), (0, shift)), mode="reflect")[:, :, shift:]
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_cutouts_shapes_and_zero_channels(rng):
    x = jnp.asarray(rng.standard_normal((7, 40, 30)), jnp.float32)
    key = jax.random.PRNGKey(0)
    for fn in [
        lambda: da.random_cutout_dev(key, x, 40 / 30, 3),
        lambda: da.spec_augment_dev(key, x, 3),
        lambda: da.cutout_holes_dev(key, x, 8, 8, 3),
    ]:
        y = np.asarray(fn())
        assert y.shape == x.shape
        changed = y[4:] != np.asarray(x)[4:]
        assert np.all(y[4:][changed] == 0.0)


def test_batched_augment_runs_and_changes_data(rng):
    fn = da.make_device_augment("salsa", "mic", 3, 40, 30)
    x = jnp.asarray(rng.standard_normal((4, 7, 40, 30)), jnp.float32)
    sed = jnp.zeros((4, 5, 3))
    doa = jnp.asarray(rng.standard_normal((4, 5, 9)), jnp.float32)
    x2, sed2, doa2 = jax.jit(fn)(jax.random.PRNGKey(3), x, sed, doa)
    assert x2.shape == x.shape and doa2.shape == doa.shape
    assert not np.allclose(np.asarray(x2), np.asarray(x))
    assert np.all(np.isfinite(np.asarray(x2)))


def test_feature_mode_transforms_features_but_never_labels(rng):
    """mode='feature' (the ablation arm): frequency shift + cutout family
    still fire, but label-coupled channel swaps are disabled — DOA/SED labels
    pass through untouched for EVERY key, while features still change."""
    fn = da.make_device_augment("salsa", "mic", 3, 40, 30, mode="feature")
    x = jnp.asarray(rng.standard_normal((8, 7, 40, 30)), jnp.float32)
    sed = jnp.asarray(rng.standard_normal((8, 5, 3)), jnp.float32)
    doa = jnp.asarray(rng.standard_normal((8, 5, 9)), jnp.float32)
    changed = False
    for seed in range(4):
        x2, sed2, doa2 = jax.jit(fn)(jax.random.PRNGKey(seed), x, sed, doa)
        np.testing.assert_array_equal(np.asarray(doa2), np.asarray(doa))
        np.testing.assert_array_equal(np.asarray(sed2), np.asarray(sed))
        changed = changed or not np.allclose(np.asarray(x2), np.asarray(x))
    assert changed, "feature-only transforms never fired"
    with pytest.raises(ValueError):
        da.make_device_augment("salsa", "mic", 3, 40, 30, mode="nope")


@pytest.mark.parametrize("m", [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)])
def test_gcc_swap_dev_matches_host(rng, m):
    from salsa_tpu.data.transforms import SwapChannelGccMic
    import jax.numpy as jnp

    x = rng.standard_normal((10, 5, 6)).astype(np.float32)
    doa = rng.standard_normal((5, 9)).astype(np.float32)
    sed = np.zeros((5, 3), np.float32)

    class _R:
        def __init__(self, m):
            self._m = np.array(m)

        def integers(self, *a, **k):
            return self._m

        def random(self):
            return 0.0

    t = SwapChannelGccMic(always_apply=True, n_classes=3)
    t.rng = _R(m)
    hx, _, hd = t.apply(x, sed, doa)
    dx, dd = da.swap_channel_gcc_dev(jnp.asarray(x), jnp.asarray(doa),
                                     jnp.asarray(m, jnp.float32), 3)
    np.testing.assert_allclose(np.asarray(dx), hx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dd), hd, atol=1e-6)


def test_gcc_batched_augment(rng):
    import jax, jax.numpy as jnp

    fn = da.make_device_augment("linspecgcc", "mic", 3, 40, 30)
    x = jnp.asarray(rng.standard_normal((2, 10, 40, 30)), jnp.float32)
    sed = jnp.zeros((2, 5, 3))
    doa = jnp.asarray(rng.standard_normal((2, 5, 9)), jnp.float32)
    x2, _, doa2 = jax.jit(fn)(jax.random.PRNGKey(5), x, sed, doa)
    assert x2.shape == x.shape and np.all(np.isfinite(np.asarray(x2)))
