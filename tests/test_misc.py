"""Odds and ends: arbitrary mic counts for SALSA (contrib/salsa_flexible parity),
batched-vs-sequential extraction equality, profiling utils."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from salsa_tpu.features.salsa import SalsaParams, extract_salsa
from salsa_tpu.utils.profiling import stage_timer


@pytest.mark.slow
def test_salsa_arbitrary_mic_count(rng):
    """The reference's contrib/salsa_flexible supports arbitrary mic counts; our
    extractor is mic-count generic by construction (pallas falls back to XLA)."""
    for n_ch in (4, 6):
        x = (0.1 * rng.standard_normal((n_ch, 4000))).astype(np.float32)
        p = SalsaParams(fs=8000, n_fft=256, hop_length=150, fmax_doa=2000.0,
                        audio_format="mic", eig_method="pallas")
        feat = np.asarray(extract_salsa(jnp.asarray(x), p))
        assert feat.shape[0] == 2 * n_ch - 1  # n_ch specs + (n_ch-1) eigvec channels
        assert np.all(np.isfinite(feat))


def test_batched_extraction_matches_sequential(rng):
    """vmapped extraction must produce identical features per clip."""
    p = SalsaParams(fs=8000, n_fft=256, hop_length=150, fmax_doa=2000.0,
                    audio_format="foa", eig_method="power")
    waves = (0.1 * rng.standard_normal((3, 4, 4000))).astype(np.float32)
    single = np.stack([np.asarray(extract_salsa(jnp.asarray(w), p)) for w in waves])
    batched = np.asarray(
        jax.jit(jax.vmap(lambda w: extract_salsa(w, p)))(jnp.asarray(waves))
    )
    np.testing.assert_allclose(batched, single, atol=1e-5)


def test_stage_timer():
    t = stage_timer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    summary = t.summary()
    assert "a" in summary and t.counts["a"] == 2
