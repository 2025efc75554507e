import numpy as np
import pytest
import jax
import jax.numpy as jnp

from salsa_tpu.train.losses import seld_loss, accdoa_loss, bce_with_logits, masked_reg_loss
from salsa_tpu.train.schedules import make_lr_momentum_schedules
from salsa_tpu.train.submission import combine_chunks, write_classwise_csv, sed_from_accdoa
from salsa_tpu.train.state import make_optimizer, create_train_state
from salsa_tpu.train import checkpoint as ckpt

torch = pytest.importorskip("torch")


def test_bce_matches_torch(rng):
    logits = rng.standard_normal((4, 10, 12)).astype(np.float32)
    targets = (rng.random((4, 10, 12)) < 0.2).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_masked_mae_matches_reference_formula(rng):
    pred = rng.standard_normal((2, 8, 5)).astype(np.float32)
    tgt = rng.standard_normal((2, 8, 5)).astype(np.float32)
    mask = (rng.random((2, 8, 5)) < 0.3).astype(np.float32)
    ours = float(masked_reg_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
    expect = np.sum(np.abs(pred - tgt) * mask) / np.sum(mask)
    np.testing.assert_allclose(ours, expect, rtol=1e-5)


def test_seld_loss_weights(rng):
    n = 4
    pred = {
        "event_frame_logit": jnp.asarray(rng.standard_normal((2, 6, n)), jnp.float32),
        "doa_frame_output": jnp.asarray(rng.standard_normal((2, 6, 3 * n)), jnp.float32),
    }
    target = {
        "event_frame_gt": jnp.asarray((rng.random((2, 6, n)) < 0.5).astype(np.float32)),
        "doa_frame_gt": jnp.asarray(rng.standard_normal((2, 6, 3 * n)), jnp.float32),
    }
    total, sed_l, doa_l = seld_loss(pred, target, n, (0.3, 0.7))
    np.testing.assert_allclose(float(total), 0.3 * float(sed_l) + 0.7 * float(doa_l), rtol=1e-6)


def test_lr_momentum_schedule_matches_np_interp():
    lr_s, mom_s = make_lr_momentum_schedules(
        1000, (0.0, 0.1, 0.7, 1.0), (3e-4, 3e-4, 3e-4, 1e-4), (0.9, 0.85, 0.9, 0.9)
    )
    steps = np.array([0, 50, 100, 400, 700, 850, 1000])
    expect_lr = np.interp(steps, [0, 100, 700, 1000], [3e-4, 3e-4, 3e-4, 1e-4])
    got_lr = np.array([float(lr_s(s)) for s in steps])
    np.testing.assert_allclose(got_lr, expect_lr, rtol=1e-6)
    expect_m = np.interp(steps, [0, 100, 700, 1000], [0.9, 0.85, 0.9, 0.9])
    got_m = np.array([float(mom_s(s)) for s in steps])
    np.testing.assert_allclose(got_m, expect_m, rtol=1e-6)


def test_combine_chunks_mean():
    # 2 chunks of 6 frames, hop 4 -> total 10 frames, overlap 2
    a = np.ones((1, 6, 3), dtype=np.float32)
    b = np.full((1, 6, 3), 3.0, dtype=np.float32)
    out = combine_chunks(np.concatenate([a, b]), chunk_len=6, chunk_hop=4, n_frames=10)
    np.testing.assert_allclose(out[:4], 1.0)
    np.testing.assert_allclose(out[4:6], 2.0)  # mean of 1 and 3
    np.testing.assert_allclose(out[6:], 3.0)


def test_combine_chunks_gmean():
    a = np.full((1, 6, 1), 4.0, dtype=np.float32)
    b = np.full((1, 6, 1), 1.0, dtype=np.float32)
    out = combine_chunks(np.concatenate([a, b]), 6, 4, 10, method="gmean")
    np.testing.assert_allclose(out[4:6], 2.0)  # sqrt(4*1)


def test_write_classwise_csv_and_wrap(tmp_path):
    n, frames = 3, 12
    prob = np.zeros((frames, n))
    doa = np.zeros((frames, 3 * n))
    prob[5, 1] = 0.9
    # put event at azi exactly 180 -> must wrap to -180
    doa[5, 1] = -1.0  # x
    doa[5, n + 1] = 1e-9  # y>0 so atan2 gives +180
    doa[5, 2 * n + 1] = 0.0
    p = tmp_path / "sub.csv"
    write_classwise_csv(str(p), prob, doa, n, max_frames=frames)
    rows = p.read_text().strip().split("\n")
    assert rows == ["5,1,0,-180,0"]


def test_sed_from_accdoa():
    doa = np.zeros((2, 4, 6))
    doa[0, 0, 1] = 0.6
    doa[0, 0, 3] = 0.8
    sed = sed_from_accdoa(doa, 2)
    np.testing.assert_allclose(sed[0, 0, 1], 1.0, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, rng):
    from salsa_tpu.models.seld import build_model

    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 4},
        decoder={"name": "SeldDecoder", "decoder_type": "gru", "decoder_size": 16},
        n_classes=3,
    )
    tx = make_optimizer(100)
    x = jnp.zeros((1, 4, 32, 16), jnp.float32)
    state = create_train_state(model, x, tx, seed=0)
    path = ckpt.save_checkpoint(str(tmp_path), "epoch000", state, {"valSeld": 0.5})
    state2 = create_train_state(model, x, tx, seed=1)
    restored = ckpt.restore_checkpoint(path, state2)
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert ckpt.best_checkpoint(str(tmp_path)) == path
    assert ckpt.load_metadata(path)["valSeld"] == 0.5


def test_checkpoint_orbax_roundtrip(tmp_path, rng):
    from salsa_tpu.models.seld import build_model

    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 4},
        decoder={"name": "SeldDecoder", "decoder_type": "gru", "decoder_size": 8},
        n_classes=2,
    )
    tx = make_optimizer(100)
    x = jnp.zeros((1, 4, 32, 16), jnp.float32)
    state = create_train_state(model, x, tx, seed=0)
    path = ckpt.save_checkpoint(str(tmp_path), "ep0", state, {"valSeld": 0.4},
                                backend="orbax")
    assert path.endswith(".orbax")
    restored = ckpt.restore_checkpoint(path, create_train_state(model, x, tx, seed=5))
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.best_checkpoint(str(tmp_path)) == path
