"""Shared worker for the multi-host integration test (tests/test_multihost.py).

Importable (single-process expected-value run) and executable (spawned once per
process with SALSA_COORDINATOR/SALSA_NUM_PROCESSES/SALSA_PROCESS_ID set; each
process gets 4 virtual CPU devices, so 2 processes form the same 8-device global
mesh the in-test single-process run uses).
"""
from __future__ import annotations

import json
import os
import sys


def build_problem():
    import numpy as np

    from salsa_tpu.data.database import SplitData
    from salsa_tpu.utils.config import AttrDict

    rng = np.random.default_rng(7)
    n_chunks, chunk, label_chunk = 24, 64, 32
    features = rng.standard_normal((7, 64 * 26, 32)).astype(np.float32)
    sed = (rng.random((32 * 26, 3)) < 0.3).astype(np.float32)
    doa = (rng.standard_normal((32 * 26, 9)) * 0.5).astype(np.float32)
    data = SplitData(
        features=features, sed_targets=sed, doa_targets=doa,
        feature_chunk_starts=np.arange(n_chunks) * 64,
        label_chunk_starts=np.arange(n_chunks) * 32,
        clip_names=["c"] * n_chunks, feature_chunk_len=chunk,
        feature_chunk_hop=chunk, label_chunk_len=label_chunk,
        label_chunk_hop=label_chunk, chunks_per_clip=n_chunks,
    )
    cfg = AttrDict({
        "data": {"fs": 8000, "hop_len": 400, "n_classes": 3, "label_rate": 10,
                 "output_format": "reg_xyz"},
        "training": {"train_batch_size": 8, "max_epochs": 2,
                     "lr_scheduler": {"milestones": [0, 1], "lrs": [1e-3, 1e-3],
                                      "moms": [0.9, 0.9]}},
    })
    return data, cfg


def make_trainer():
    from salsa_tpu.models.seld import build_model
    from salsa_tpu.train.trainer import SeldTrainer

    data, cfg = build_problem()
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "gru", "decoder_size": 16,
                 "freq_pool": "avg"},
        n_classes=3,
    )
    return SeldTrainer(model=model, cfg=cfg, train_data=data, val_data=None,
                       gt_meta_dir=None, submission_dir="/tmp/salsa_mh", seed=0)


def make_fromwav_trainer(workdir: str):
    """Fused raw-wav training over a deterministic synthetic corpus, with
    device_data_shard (the flagship large-scale config): exercises the
    from_wav multi-process dispatch (make_array_from_process_local_data over
    chunk-index blocks, trainer.py train_epoch) AND the clip-sharded wave
    placement (shard_global) across a real process boundary."""
    import numpy as np

    from tests.test_from_wav import (
        E2E_FS, E2E_HOP, E2E_NFFT, _geometry_db, _write_synth_corpus,
    )
    from salsa_tpu.data.wav_database import fit_scaler_from_waves, load_wav_split
    from salsa_tpu.features.chunked import required_pad
    from salsa_tpu.features.registry import make_extractor
    from salsa_tpu.models.seld import build_model
    from salsa_tpu.train.trainer import SeldTrainer
    from salsa_tpu.utils.config import AttrDict

    os.makedirs(workdir, exist_ok=True)
    names, meta_dir = _write_synth_corpus(workdir, np.random.default_rng(3),
                                          n_clips=8, seconds=4.0)
    extractor = make_extractor("salsa", "foa", fs=E2E_FS, n_fft=E2E_NFFT,
                               hop_length=E2E_HOP, fmax_doa=3000.0,
                               eig_method="power")
    db = _geometry_db(os.path.join(workdir, "feat_unused"), workdir)
    wav_split = load_wav_split(db, "train", os.path.join(workdir, "foa_dev"),
                               split_meta_dir=meta_dir, n_channels=7,
                               n_features=extractor.n_features,
                               pad=required_pad("salsa", E2E_NFFT))
    scaler = fit_scaler_from_waves(extractor, wav_split.clip_wavs, 4)
    cfg = AttrDict({
        "feature_type": "salsa",
        "data": {"fs": E2E_FS, "n_fft": E2E_NFFT, "hop_len": E2E_HOP,
                 "n_classes": 3, "fmax_doa": 3000.0, "audio_format": "foa",
                 "label_rate": 10, "output_format": "reg_xyz",
                 "max_file_len_s": 4.0},
        "training": {"train_batch_size": 8, "max_epochs": 2, "from_wav": True,
                     "device_data_shard": True, "eig_method": "power",
                     "steps_per_dispatch": 1,
                     "lr_scheduler": {"milestones": [0, 1], "lrs": [1e-3, 1e-3],
                                      "moms": [0.9, 0.9]}},
    })
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "gru",
                 "decoder_size": 16, "freq_pool": "avg"},
        n_classes=3)
    return SeldTrainer(model=model, cfg=cfg, train_data=wav_split,
                       val_data=None, gt_meta_dir=None,
                       submission_dir=os.path.join(workdir, "sub"), seed=0,
                       scaler=scaler)


def make_shard_trainer():
    """Feature-resident split sharded over the data axis: exercises
    _setup_sharded_resident's shard_global placement and train_epoch's
    sharded-branch process-local index feed."""
    import numpy as np

    from tests.test_shard_resident import build_split, make_cfg
    from salsa_tpu.models.seld import build_model
    from salsa_tpu.train.trainer import SeldTrainer

    data = build_split(np.random.default_rng(5))
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "gru",
                 "decoder_size": 16, "freq_pool": "avg"},
        n_classes=3)
    return SeldTrainer(model=model, cfg=make_cfg(True), train_data=data,
                       val_data=None, gt_meta_dir=None,
                       submission_dir="/tmp/salsa_mh", seed=3)


def run(n_epochs: int = 2, mode: str = "", workdir: str = "/tmp/salsa_mh_wav") \
        -> list[float]:
    if mode == "fromwav":
        trainer = make_fromwav_trainer(workdir)
        assert trainer.from_wav and trainer._shard_chunk_ids is not None
    elif mode == "shard":
        trainer = make_shard_trainer()
        assert trainer.device_data_shard
    else:
        trainer = make_trainer()
    # re-align before the first collective-bearing dispatch: per-process setup
    # (corpus synth, tracker checkpoints, scaler fit) can skew wall clocks past
    # gloo's 30 s communicator-rendezvous timeout on this 1-core box
    from salsa_tpu.parallel.distributed import barrier

    barrier(f"pre_train_{mode or 'hostfed'}")
    return [float(trainer.train_epoch(e)["loss"]) for e in range(n_epochs)]


def run_resume_phase(phase: str, ckpt_dir: str) -> list[float]:
    """Crash-resume across REAL process restarts (VERDICT r2 #3): phase1 trains
    epoch 0 and checkpoints; phase2 (a fresh process pair) restores through
    SeldTrainer.restore — which must re-commit host leaves to the multi-process
    mesh — and trains epoch 1."""
    import jax
    from jax.experimental import multihost_utils

    from salsa_tpu.train import checkpoint as ckpt

    trainer = make_trainer()
    if phase == "1":
        losses = [float(trainer.train_epoch(0)["loss"])]
        if jax.process_index() == 0:
            ckpt.save_checkpoint(ckpt_dir, "epoch000", trainer.state,
                                 {"epoch": 0})
        # all processes must see the file before anyone exits
        multihost_utils.sync_global_devices("ckpt_written")
        return losses
    start_epoch = trainer.restore(os.path.join(ckpt_dir, "epoch000.msgpack"))
    assert start_epoch == 1, start_epoch
    return [float(trainer.train_epoch(start_epoch)["loss"])]


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SALSA_TEST_JIT_CACHE",
                                     "/tmp/salsa_tpu_test_jit_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from salsa_tpu.parallel.distributed import initialize

    initialize()  # forms the 2-process global runtime from SALSA_* env vars
    assert jax.process_count() == int(os.environ["SALSA_NUM_PROCESSES"])
    assert len(jax.devices()) == 8, f"global devices: {len(jax.devices())}"
    phase = os.environ.get("SALSA_MH_RESUME_PHASE")
    if phase:
        losses = run_resume_phase(phase, os.environ["SALSA_MH_CKPT_DIR"])
    else:
        # per-process corpus dir: identical (seeded) content, no write races
        losses = run(
            mode=os.environ.get("SALSA_MH_MODE", ""),
            workdir=os.environ.get(
                "SALSA_MH_WORKDIR",
                f"/tmp/salsa_mh_wav_p{jax.process_index()}"),
        )
    print(json.dumps({"pid": jax.process_index(), "losses": losses}), flush=True)


if __name__ == "__main__":
    main()
