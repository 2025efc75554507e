"""TTA algebra test via an exactly-equivariant synthetic 'model': a predictor that
reads the DOA directly off the spatial feature channels transforms its output by the
SAME signed permutation as the label algebra — so the TTA inverse map must return
every variant's prediction to the identity frame exactly."""
import numpy as np
import pytest

from salsa_tpu.train.tta import ChannelSwapTTA


def foa_equivariant_model(x, n_classes):
    """x: (B, 7, T, F) FOA tfmap. Predict per-class DOA = mean of the spatial
    channels (IVy=ch4, IVz=ch5, IVx=ch6) broadcast over classes."""
    B = x.shape[0]
    iv_y = x[:, 4].mean(axis=(1, 2))
    iv_z = x[:, 5].mean(axis=(1, 2))
    iv_x = x[:, 6].mean(axis=(1, 2))
    doa = np.zeros((B, 4, 3 * n_classes), dtype=np.float32)
    for c in range(n_classes):
        doa[:, :, c] = iv_x[:, None]
        doa[:, :, n_classes + c] = iv_y[:, None]
        doa[:, :, 2 * n_classes + c] = iv_z[:, None]
    return doa


def test_foa_tta_roundtrip(rng):
    n_classes = 3
    tta = ChannelSwapTTA("foa", n_classes)
    assert len(tta) == 16
    x = rng.standard_normal((2, 7, 6, 5)).astype(np.float32)
    base = foa_equivariant_model(x, n_classes)
    for i in range(len(tta)):
        xt = tta.transform_features(x, i)
        pred_t = foa_equivariant_model(xt, n_classes)
        back = tta.inverse_doa(pred_t, i)
        np.testing.assert_allclose(back, base, atol=1e-6, err_msg=f"variant {i}")


def test_label_matrices_are_signed_permutations():
    for kind, n_var in [("foa", 16), ("mic", 8), ("gcc", 4)]:
        tta = ChannelSwapTTA(kind, 4)
        assert len(tta) == n_var
        for L in tta._label_mats:
            # orthogonal with entries in {-1, 0, 1}, one nonzero per row/col
            np.testing.assert_allclose(L @ L.T, np.eye(3), atol=1e-12)
            assert set(np.abs(L).ravel()) <= {0.0, 1.0}
            assert np.all(np.abs(L).sum(axis=0) == 1)


def test_mic_tta_involution(rng):
    """Applying a MIC variant's feature transform then checking the inverse label
    matrix against a gt round-trip through the raw transform."""
    from salsa_tpu.data.transforms import swap_channel_mic

    n = 3
    tta = ChannelSwapTTA("mic", n)
    doa = rng.standard_normal((5, 3 * n)).astype(np.float32)
    sed = np.zeros((5, n), np.float32)
    x = rng.standard_normal((7, 4, 4)).astype(np.float32)
    for i, m in enumerate(tta.masks):
        _, _, doa_t = swap_channel_mic(x, sed, doa, m, n)
        back = tta.inverse_doa(doa_t, i)
        np.testing.assert_allclose(back, doa, atol=1e-6)


def test_gcc_tta_roundtrip(rng):
    """GCC TTA (4 mutually-exclusive variants): inverse label map returns every
    variant's prediction to the identity frame through a gt round trip."""
    from salsa_tpu.data.transforms import swap_channel_gcc

    n = 3
    tta = ChannelSwapTTA("gcc", n)
    assert len(tta) == 4
    doa = rng.standard_normal((5, 3 * n)).astype(np.float32)
    sed = np.zeros((5, n), np.float32)
    x = rng.standard_normal((10, 4, 4)).astype(np.float32)
    for i, m in enumerate(tta.masks):
        _, _, doa_t = swap_channel_gcc(x, sed, doa, m, n)
        back = tta.inverse_doa(doa_t, i)
        np.testing.assert_allclose(back, doa, atol=1e-6, err_msg=f"variant {i}")


def test_tta_kind_mapping():
    from salsa_tpu.train.tta import tta_kind

    assert tta_kind("salsa", "foa") == "foa"
    assert tta_kind("salsa", "mic") == "mic"
    assert tta_kind("linspecgcc", "mic") == "gcc"
    assert tta_kind("melspecgcc", "mic") == "gcc"


def test_tta_rejects_channel_mismatch():
    """A 4-channel (non-directional, e.g. melspec) stream must fail at
    construction with a config error, not on the first batch (ADVICE r2)."""
    with pytest.raises(ValueError, match="7-channel"):
        ChannelSwapTTA("foa", 12, n_input_channels=4)
    with pytest.raises(ValueError, match="10-channel"):
        ChannelSwapTTA("gcc", 12, n_input_channels=7)
    # matching channel counts construct fine
    ChannelSwapTTA("foa", 12, n_input_channels=7)
    ChannelSwapTTA("gcc", 12, n_input_channels=10)
