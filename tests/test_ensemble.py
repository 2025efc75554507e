"""Prediction-level ensemble fusion (train/ensemble.py + cli/ensemble.py).

The reference dumps per-clip h5 predictions (interfaces.py:182-202) to enable
the post-hoc model fusion its DCASE entry used; these tests pin the fusion
semantics: exact weighted mean, identity for a single member, loud failure on
mismatched clip sets, and CSV equality with the single-model writer path.
"""
from __future__ import annotations

import os

import h5py
import numpy as np
import pytest

from salsa_tpu.train.ensemble import (
    ensemble_predictions,
    load_prediction_dir,
    write_ensemble,
)

N_CLASSES = 4
FRAMES = 20


def _dump(pred_dir, preds):
    """Write {name: (ep, dp)} in the trainer's dump layout (leading batch axis)."""
    os.makedirs(pred_dir, exist_ok=True)
    for name, (ep, dp) in preds.items():
        with h5py.File(os.path.join(pred_dir, name + ".h5"), "w") as hf:
            hf.create_dataset("event_frame_pred", data=ep[None], dtype=np.float32)
            hf.create_dataset("doa_frame_pred", data=dp[None], dtype=np.float32)


def _rand_preds(rng, names):
    out = {}
    for name in names:
        ep = rng.random((FRAMES, N_CLASSES)).astype(np.float32)
        dp = rng.uniform(-1, 1, (FRAMES, 3 * N_CLASSES)).astype(np.float32)
        out[name] = (ep, dp)
    return out


def test_single_member_is_identity(tmp_path):
    rng = np.random.default_rng(0)
    preds = _rand_preds(rng, ["clip_a", "clip_b"])
    _dump(tmp_path / "m0", preds)
    fused = ensemble_predictions([str(tmp_path / "m0")])
    assert set(fused) == set(preds)
    for name in preds:
        np.testing.assert_allclose(fused[name][0], preds[name][0], rtol=1e-6)
        np.testing.assert_allclose(fused[name][1], preds[name][1], rtol=1e-6)


def test_weighted_mean_exact(tmp_path):
    rng = np.random.default_rng(1)
    a = _rand_preds(rng, ["clip"])
    b = _rand_preds(rng, ["clip"])
    _dump(tmp_path / "a", a)
    _dump(tmp_path / "b", b)
    fused = ensemble_predictions([str(tmp_path / "a"), str(tmp_path / "b")],
                                 weights=[3.0, 1.0])
    for i in range(2):
        expect = (3.0 * a["clip"][i] + 1.0 * b["clip"][i]) / 4.0
        np.testing.assert_allclose(fused["clip"][i], expect, rtol=1e-6)


def test_mismatched_clip_sets_raise(tmp_path):
    rng = np.random.default_rng(2)
    _dump(tmp_path / "a", _rand_preds(rng, ["clip_a"]))
    _dump(tmp_path / "b", _rand_preds(rng, ["clip_b"]))
    with pytest.raises(ValueError, match="different clip sets"):
        ensemble_predictions([str(tmp_path / "a"), str(tmp_path / "b")])
    with pytest.raises(ValueError, match="weights"):
        ensemble_predictions([str(tmp_path / "a")], weights=[1.0, 1.0])
    with pytest.raises(FileNotFoundError):
        load_prediction_dir(str(tmp_path / "empty"))


def test_identical_members_match_single_model_csvs(tmp_path):
    """Fusing a model with itself must reproduce the single-model submission
    byte for byte (same writer, same thresholding)."""
    from salsa_tpu.train.submission import write_classwise_csv

    rng = np.random.default_rng(3)
    preds = _rand_preds(rng, ["clip_a", "clip_b"])
    _dump(tmp_path / "m", preds)
    fused = ensemble_predictions([str(tmp_path / "m")] * 3)
    written = write_ensemble(fused, str(tmp_path / "sub"), N_CLASSES,
                             sed_threshold=0.5)
    assert written == ["clip_a.csv", "clip_b.csv"]
    for name, (ep, dp) in preds.items():
        ref_path = tmp_path / (name + "_ref.csv")
        write_classwise_csv(str(ref_path), ep, dp, N_CLASSES,
                            sed_threshold=0.5, max_frames=FRAMES)
        got = (tmp_path / "sub" / (name + ".csv")).read_text()
        assert got == ref_path.read_text()


def test_average_checkpoint_files(tmp_path):
    """SWA-style parameter averaging: float leaves weighted-averaged, integer
    leaves and opt_state taken from the first member, restorable via the
    normal checkpoint loader."""
    from types import SimpleNamespace

    from salsa_tpu.train import checkpoint as ckpt
    from salsa_tpu.train.ensemble import average_checkpoint_files

    rng = np.random.default_rng(5)

    def make_state(scale):
        return SimpleNamespace(
            step=7,
            params={"dense": {"kernel": scale * np.ones((3, 2), np.float32),
                              "bias": rng.standard_normal(2).astype(np.float32)}},
            batch_stats={"bn": {"mean": scale * np.ones(2, np.float32)}},
            opt_state={"count": np.int32(7)},
            replace=None,
        )

    s1, s2 = make_state(1.0), make_state(3.0)
    p1 = ckpt.save_checkpoint(str(tmp_path), "a", s1)
    p2 = ckpt.save_checkpoint(str(tmp_path), "b", s2)
    out = average_checkpoint_files([p1, p2], str(tmp_path / "avg.msgpack"),
                                   weights=[1.0, 3.0])
    from flax import serialization

    payload = serialization.msgpack_restore(open(out, "rb").read())
    # (1*1 + 3*3)/4 = 2.5 for the scale-carrying leaves
    np.testing.assert_allclose(payload["params"]["dense"]["kernel"], 2.5)
    np.testing.assert_allclose(payload["batch_stats"]["bn"]["mean"], 2.5)
    expect_bias = (s1.params["dense"]["bias"] + 3 * s2.params["dense"]["bias"]) / 4
    np.testing.assert_allclose(payload["params"]["dense"]["bias"], expect_bias,
                               rtol=1e-6)
    assert int(np.asarray(payload["opt_state"]["count"])) == 7
    meta = ckpt.load_metadata(out)
    assert meta["averaged_from"] == ["a.msgpack", "b.msgpack"]
    # identity: averaging a checkpoint with itself changes nothing
    out2 = average_checkpoint_files([p1, p1], str(tmp_path / "id.msgpack"))
    pl = serialization.msgpack_restore(open(out2, "rb").read())
    np.testing.assert_array_equal(pl["params"]["dense"]["bias"],
                                  s1.params["dense"]["bias"])
    # mismatched trees refuse
    s3 = make_state(1.0)
    s3.params = {"other": {"kernel": np.ones((3, 2), np.float32)}}
    p3 = ckpt.save_checkpoint(str(tmp_path), "c", s3)
    with pytest.raises(ValueError, match="tree differs"):
        average_checkpoint_files([p1, p3], str(tmp_path / "bad.msgpack"))


def test_cli_scores_fusion_against_gt(tmp_path):
    """End-to-end through cli.ensemble: two noisy copies of a perfect prediction
    fuse back to (near) the ground truth and score ~perfectly."""
    from salsa_tpu.cli.ensemble import ensemble as ensemble_cli
    from salsa_tpu.train.submission import write_classwise_csv

    rng = np.random.default_rng(4)
    # ground truth: one active class per segment with a unit DOA
    ep = np.zeros((FRAMES, N_CLASSES), np.float32)
    dp = np.zeros((FRAMES, 3 * N_CLASSES), np.float32)
    ep[:, 1] = 1.0
    dp[:, 1] = 1.0  # x-axis
    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    write_classwise_csv(str(gt_dir / "clip.csv"), ep, dp, N_CLASSES,
                        sed_threshold=0.5, max_frames=FRAMES)
    # two members: GT + opposite zero-mean DOA noise, SED prob 0.6 (thresholdable)
    noise = rng.uniform(-0.2, 0.2, dp.shape).astype(np.float32)
    for tag, sign in (("a", 1.0), ("b", -1.0)):
        _dump(tmp_path / tag, {"clip": (0.6 * ep, dp + sign * noise)})
    scores = ensemble_cli(
        [str(tmp_path / "a"), str(tmp_path / "b")], str(tmp_path / "fused"),
        n_classes=N_CLASSES, sed_threshold=0.5, gt_meta_dir=str(gt_dir),
    )
    assert scores["seld_error"] < 1e-6, scores
    # sanity: the fused DOA really is the noise-free ground truth
    fused = ensemble_predictions([str(tmp_path / "a"), str(tmp_path / "b")])
    np.testing.assert_allclose(fused["clip"][1], dp, atol=1e-6)
