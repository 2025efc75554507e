"""training.device_data_shard: the resident split sharded over the data axis
(VERDICT r2 #4). Checks (a) per-device footprint drops n_data-fold, (b) the loss
trace equals the replicated-resident path when both visit identical batches."""
import numpy as np
import pytest
import jax

from salsa_tpu.data.database import SplitData
from salsa_tpu.models.seld import build_model
from salsa_tpu.utils.config import AttrDict


def build_split(rng, n_clips=8, chunks_per_clip=4, chunk=64, label_chunk=32):
    n_chunks = n_clips * chunks_per_clip
    clip_T = chunk * chunks_per_clip
    features = rng.standard_normal((7, clip_T * n_clips, 32)).astype(np.float32)
    sed = (rng.random((label_chunk * chunks_per_clip * n_clips, 3)) < 0.3
           ).astype(np.float32)
    doa = (rng.standard_normal((sed.shape[0], 9)) * 0.5).astype(np.float32)
    f_starts, l_starts, counts = [], [], []
    for c in range(n_clips):
        for k in range(chunks_per_clip):
            f_starts.append(c * clip_T + k * chunk)
            l_starts.append(c * label_chunk * chunks_per_clip + k * label_chunk)
        counts.append(chunks_per_clip)
    return SplitData(
        features=features, sed_targets=sed, doa_targets=doa,
        feature_chunk_starts=np.asarray(f_starts),
        label_chunk_starts=np.asarray(l_starts),
        clip_names=["c"] * n_chunks, feature_chunk_len=chunk,
        feature_chunk_hop=chunk, label_chunk_len=label_chunk,
        label_chunk_hop=label_chunk, chunks_per_clip=chunks_per_clip,
        unique_clip_names=[f"c{i}" for i in range(n_clips)],
        clip_chunk_counts=np.asarray(counts),
        clip_label_frames=np.full(n_clips, label_chunk * chunks_per_clip),
    )


def make_cfg(shard: bool) -> AttrDict:
    return AttrDict({
        "data": {"fs": 8000, "hop_len": 400, "n_classes": 3, "label_rate": 10,
                 "output_format": "reg_xyz"},
        "training": {"train_batch_size": 8, "max_epochs": 2,
                     "device_data": True, "device_data_shard": shard,
                     "steps_per_dispatch": 2,
                     "lr_scheduler": {"milestones": [0, 1], "lrs": [1e-3, 1e-3],
                                      "moms": [0.9, 0.9]}},
    })


@pytest.mark.slow
def test_sharded_resident_matches_replicated(rng, tmp_path):
    from salsa_tpu.train.trainer import SeldTrainer

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    data = build_split(rng)

    def make_trainer(shard: bool) -> SeldTrainer:
        model = build_model(
            encoder={"name": "PannResNet22", "n_input_channels": 7},
            decoder={"name": "SeldDecoder", "decoder_type": "gru",
                     "decoder_size": 16, "freq_pool": "avg"},
            n_classes=3)
        return SeldTrainer(model=model, cfg=make_cfg(shard), train_data=data,
                           val_data=None, gt_meta_dir=None,
                           submission_dir=str(tmp_path), seed=3)

    sharded = make_trainer(True)
    n_data = sharded.mesh.shape["data"]
    assert n_data > 1
    arr = sharded._dev_features_sharded
    # (a) each device holds only its clip shard
    assert arr.addressable_shards[0].data.shape[0] == arr.shape[0] // n_data

    sharded_losses = [float(sharded.train_epoch(e)["loss"]) for e in range(2)]

    replicated = make_trainer(False)
    # (b) same batches: route the replicated run through the stratified order
    replicated._epoch_order = sharded._epoch_order
    repl_losses = [float(replicated.train_epoch(e)["loss"]) for e in range(2)]

    np.testing.assert_allclose(sharded_losses, repl_losses, rtol=1e-5,
                               err_msg=f"{sharded_losses} vs {repl_losses}")
