import numpy as np
import pytest
import jax
import jax.numpy as jnp

from salsa_tpu.models.seld import build_model
from salsa_tpu.train.state import create_train_state, dropout_rng, make_optimizer
from salsa_tpu.train.trainer import make_train_step


@pytest.mark.slow
def test_remat_step_matches_plain(rng):
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "gru", "decoder_size": 16},
        n_classes=3,
    )
    x = jnp.asarray(rng.standard_normal((2, 7, 64, 32)), jnp.float32)
    sed = jnp.asarray((rng.random((2, 8, 3)) < 0.4).astype(np.float32))
    doa = jnp.asarray(rng.standard_normal((2, 8, 9)) * 0.5, jnp.float32)
    key = dropout_rng(0)

    results = []
    for remat in (False, True):
        tx = make_optimizer(100)
        state = create_train_state(model, x, tx, seed=0)
        step = make_train_step(model, 3, (0.3, 0.7), "reg_xyz", 2.0, remat=remat)
        state, metrics = step(state, x, sed, doa, key)
        results.append((float(metrics["loss"]),
                        jax.device_get(jax.tree.leaves(state.params))))
    assert np.isclose(results[0][0], results[1][0], rtol=1e-5)
    for a, b in zip(results[0][1], results[1][1]):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
