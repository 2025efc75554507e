"""SELD trainer: jitted sharded train/eval steps + the epoch loop with validation
scoring, submission writing, checkpointing and TensorBoard logging.

This replaces the reference's PyTorch-Lightning runtime (models/seld_models.py,
experiments/train.py) with a TPU-native design: one jitted train step over a
`jax.sharding.Mesh` (data-parallel batch, GSPMD gradient psum over ICI), BN stats
reduced over the global batch inside jit, schedules evaluated on device, and all
host work (CSV submissions, Hungarian scoring) kept out of the step function.
"""
from __future__ import annotations

import os
import shutil
import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from salsa_tpu.data.dataset import SeldChunkDataset, batch_iterator, prefetch
from salsa_tpu.metrics.scorer import evaluate_submissions
from salsa_tpu.models.seld import interpolate_index_repeat
from salsa_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_global,
)
from salsa_tpu.train import checkpoint as ckpt
from salsa_tpu.train.losses import seld_loss, accdoa_loss
from salsa_tpu.train.state import (
    TrainState,
    create_train_state,
    dropout_rng,
    make_optimizer,
)
from salsa_tpu.utils.experiments import logger


def make_train_step(model, n_classes: int, loss_weight, output_format: str,
                    interp_ratio: float, remat: bool = False, augment_fn=None,
                    accdoa_silent_weight: float = 0.0):
    """remat=True rematerializes the forward activations during backward
    (jax.checkpoint with matmul outputs saved) — trades ~30% step time for a
    large-batch/long-chunk memory footprint cut. augment_fn (from
    train/device_augment.py) applies data augmentation in-graph."""

    def apply_model(params, batch_stats, x, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )

    if remat:
        apply_model = jax.checkpoint(
            apply_model,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def train_step(state: TrainState, x, sed_gt, doa_gt, rng):
        rng = jax.random.fold_in(rng, state.step)
        if augment_fn is not None:
            aug_rng, rng = jax.random.split(rng)
            x, sed_gt, doa_gt = augment_fn(aug_rng, x, sed_gt, doa_gt)

        def loss_fn(params):
            out, updates = apply_model(params, state.batch_stats, x, rng)
            pred = {
                "event_frame_logit": interpolate_index_repeat(
                    out["event_frame_logit"], interp_ratio
                ),
                "doa_frame_output": interpolate_index_repeat(
                    out["doa_frame_output"], interp_ratio
                ),
            }
            target = {"event_frame_gt": sed_gt, "doa_frame_gt": doa_gt}
            if output_format == "reg_xyz":
                total, sed_l, doa_l = seld_loss(pred, target, n_classes, loss_weight)
            else:
                total, sed_l, doa_l = accdoa_loss(pred, target, n_classes,
                                                  silent_weight=accdoa_silent_weight)
            return total, (sed_l, doa_l, updates["batch_stats"])

        (total, (sed_l, doa_l, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {"loss": total, "sed_loss": sed_l, "doa_loss": doa_l}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_resident_train_step(model, n_classes: int, loss_weight, output_format: str,
                             interp_ratio: float, chunk_len: int, label_chunk_len: int,
                             remat: bool = False, augment_fn=None, mesh=None,
                             accdoa_silent_weight: float = 0.0):
    """Device-resident data variant: the whole split's features/targets live on the
    chip and each step receives only (start-index) vectors — chunk windows are
    sliced inside the jit graph.

    Two wins: (a) zero per-step host->device tensor traffic (the host sends ~100
    bytes of indices), which also sidesteps PJRT transports that pin per-step input
    buffers; (b) chunk slicing + augmentation run on the VPU. Requires the split's
    feature tensor to fit in HBM next to the model (bf16 storage supported).

    With a `mesh`, the mode composes with GSPMD data parallelism: the resident
    split is replicated over the mesh, the per-step start-index vectors arrive
    sharded along the 'data' axis, and the gathered windows are constrained to
    batch-sharded layout — so each device slices only its own shard's windows and
    the gradient psum rides ICI exactly as in the host-fed path.
    """
    base_step = make_train_step(model, n_classes, loss_weight, output_format,
                                interp_ratio, remat=remat, augment_fn=augment_fn,
                                accdoa_silent_weight=accdoa_silent_weight)
    batch_sharding = None
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("data"))

    def gather_windows(arr, starts, length):
        # arr: (C, T, F) or (T, D); starts: (B,)
        if arr.ndim == 3:
            slice_fn = lambda s: jax.lax.dynamic_slice(
                arr, (0, s, 0), (arr.shape[0], length, arr.shape[2]))
        else:
            slice_fn = lambda s: jax.lax.dynamic_slice(
                arr, (s, 0), (length, arr.shape[1]))
        return jax.vmap(slice_fn)(starts)

    def one_step(state, features, sed_targets, doa_targets, f_starts, l_starts, rng):
        x = gather_windows(features, f_starts, chunk_len).astype(jnp.float32)
        sed = gather_windows(sed_targets, l_starts, label_chunk_len)
        doa = gather_windows(doa_targets, l_starts, label_chunk_len)
        if batch_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, batch_sharding)
            sed = jax.lax.with_sharding_constraint(sed, batch_sharding)
            doa = jax.lax.with_sharding_constraint(doa, batch_sharding)
        return base_step.__wrapped__(state, x, sed, doa, rng)

    def resident_step(state, features, sed_targets, doa_targets,
                      f_starts, l_starts, rng):
        if f_starts.ndim == 1:
            return one_step(state, features, sed_targets, doa_targets,
                            f_starts, l_starts, rng)

        # multi-step: f_starts/l_starts are (K, B) — lax.scan runs K optimizer steps
        # in ONE dispatch, amortizing host->device launch latency K-fold
        def body(st, starts):
            fs, ls = starts
            st, metrics = one_step(st, features, sed_targets, doa_targets, fs, ls, rng)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, (f_starts, l_starts))
        return state, metrics  # metrics leaves are stacked (K,)

    return jax.jit(resident_step, donate_argnums=(0,))


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across jax versions: the stable API (jax>=0.8) takes check_vma,
    the experimental one check_rep — both disabled (the window gathers are
    per-shard local by construction)."""
    try:
        from jax import shard_map

        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)
    except (ImportError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def make_sharded_resident_train_step(
    model, n_classes: int, loss_weight, output_format: str, interp_ratio: float,
    chunk_len: int, label_chunk_len: int, remat: bool = False, augment_fn=None,
    mesh=None, accdoa_silent_weight: float = 0.0,
):
    """Resident-data variant with the split SHARDED over the data axis instead of
    replicated (training.device_data_shard — VERDICT r2 #4): the per-clip feature
    tensor (n_clips, C, T_clip, F) carries NamedSharding(mesh, P('data')) on the
    clip axis, so per-device HBM drops n_data-fold and the dataset-size ceiling
    of resident mode rises accordingly.

    Each device can only slice windows from ITS OWN clips, so the window gather
    runs under shard_map (each shard sees its local (m, C, T, F) block plus
    shard-local clip indices) — the host's stratified epoch order guarantees
    every batch contains exactly B/n_data rows per shard (trainer._epoch_order).
    Everything after the gather is the standard GSPMD data-parallel step.

    Step signature: (state, features_by_clip, sed_targets, doa_targets,
    clip_local (K,B), f0 (K,B), l_starts (K,B), rng).
    """
    from jax.sharding import PartitionSpec as P

    base_step = make_train_step(model, n_classes, loss_weight, output_format,
                                interp_ratio, remat=remat, augment_fn=augment_fn,
                                accdoa_silent_weight=accdoa_silent_weight)
    batch_sharding = None
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from jax.sharding import NamedSharding

        batch_sharding = NamedSharding(mesh, P("data"))

    def _gather_local(f_shard, clip_local, f0):
        def one(ci, s):
            clip = jax.lax.dynamic_index_in_dim(f_shard, ci, axis=0, keepdims=False)
            return jax.lax.dynamic_slice(
                clip, (0, s, 0), (clip.shape[0], chunk_len, clip.shape[2]))
        return jax.vmap(one)(clip_local, f0)

    gather_local = _shard_map(
        _gather_local, mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"))

    def gather_windows(arr, starts, length):
        slice_fn = lambda s: jax.lax.dynamic_slice(
            arr, (s, 0), (length, arr.shape[1]))
        return jax.vmap(slice_fn)(starts)

    def one_step(state, features, sed_targets, doa_targets,
                 clip_local, f0, l_starts, rng):
        x = gather_local(features, clip_local, f0).astype(jnp.float32)
        sed = gather_windows(sed_targets, l_starts, label_chunk_len)
        doa = gather_windows(doa_targets, l_starts, label_chunk_len)
        if batch_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, batch_sharding)
            sed = jax.lax.with_sharding_constraint(sed, batch_sharding)
            doa = jax.lax.with_sharding_constraint(doa, batch_sharding)
        return base_step.__wrapped__(state, x, sed, doa, rng)

    def sharded_step(state, features, sed_targets, doa_targets,
                     clip_local, f0, l_starts, rng):
        if clip_local.ndim == 1:
            return one_step(state, features, sed_targets, doa_targets,
                            clip_local, f0, l_starts, rng)

        def body(st, xs):
            cl, f, ls = xs
            st, metrics = one_step(st, features, sed_targets, doa_targets,
                                   cl, f, ls, rng)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, (clip_local, f0, l_starts))
        return state, metrics

    return jax.jit(sharded_step, donate_argnums=(0,))


def make_wav_resident_train_step(
    model, n_classes: int, loss_weight, output_format: str, interp_ratio: float,
    chunk_len: int, label_chunk_len: int, chunk_feature_fn, scaler,
    n_spec_channels: int, wav_scale: float, remat: bool = False, augment_fn=None,
    mesh=None, accdoa_silent_weight: float = 0.0, clip_sharded: bool = False,
):
    """Fused raw-waveform training step (SURVEY §7): the split lives on device as
    center-padded waveforms; every step receives only chunk-index vectors and runs
    feature extraction -> scaler normalization -> augmentation -> CRNN fwd/bwd in
    ONE jit graph. This is the training-side completion of pipeline.py — the
    offline feature stage (reference salsa_feature_extraction.py:265-391) and its
    HDF5 store disappear from the workflow entirely.

    chunk_feature_fn(wave_padded, n_full, f0, floor0, cd0) -> (C, chunk_len, F)
    comes from features/chunked.py and bit-matches slicing the full-clip feature
    map (tracker state checkpoints make the mid-clip restart exact).

    Signature (after state): waves (n_clips, n_ch, S_pad), sed/doa targets,
    tables = (clip_of_chunk, f0, n_full, n_valid, l_starts, floor_ck, cd_ck)
    all indexed by global chunk id, chunk_idx (B,) or (K, B), rng.

    clip_sharded=True composes with training.device_data_shard: the waves
    tensor is sharded over the data axis on the clip axis, tables[0] holds
    SHARD-LOCAL clip indices, and the extraction runs under shard_map so every
    device reads only its own clips (the stratified epoch order guarantees each
    batch column block addresses its own shard).
    """
    base_step = make_train_step(model, n_classes, loss_weight, output_format,
                                interp_ratio, remat=remat, augment_fn=augment_fn,
                                accdoa_silent_weight=accdoa_silent_weight)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = None
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        batch_sharding = NamedSharding(mesh, P("data"))

    mean = jnp.asarray(scaler[0])
    std = jnp.asarray(scaler[1])

    def gather_windows(arr, starts, length):
        slice_fn = lambda s: jax.lax.dynamic_slice(
            arr, (s, 0), (length, arr.shape[1]))
        return jax.vmap(slice_fn)(starts)

    def extract_batch(waves, clips, f0s, n_fulls, n_valids, floors, cds):
        def extract(clip, f0, nf, nv, fl, cd):
            wave = jax.lax.dynamic_index_in_dim(waves, clip, axis=0,
                                                keepdims=False)
            wave = wave.astype(jnp.float32) * wav_scale
            feat = chunk_feature_fn(wave, nf, f0, fl, cd)
            head = (feat[:n_spec_channels] - mean) / std
            feat = jnp.concatenate([head, feat[n_spec_channels:]], axis=0)
            # short-clip pad region is true zeros in the feature-store path
            # (database.py pads AFTER normalization) — reproduce exactly
            ok = (jnp.arange(chunk_len) < nv).astype(feat.dtype)
            return feat * ok[None, :, None]

        return jax.vmap(extract)(clips, f0s, n_fulls, n_valids, floors, cds)

    if clip_sharded:
        extract_sharded = _shard_map(
            extract_batch, mesh, in_specs=(P("data"),) + (P("data"),) * 6,
            out_specs=P("data"))

    def one_step(state, waves, sed_targets, doa_targets, tables, chunk_idx, rng):
        clip_of_chunk, f0s, n_fulls, n_valids, l_starts, floor_ck, cd_ck = tables
        args = (clip_of_chunk[chunk_idx], f0s[chunk_idx], n_fulls[chunk_idx],
                n_valids[chunk_idx], floor_ck[chunk_idx], cd_ck[chunk_idx])
        if clip_sharded:
            args = tuple(jax.lax.with_sharding_constraint(a, batch_sharding)
                         for a in args)
            x = extract_sharded(waves, *args)
        else:
            x = extract_batch(waves, *args)
        sed = gather_windows(sed_targets, l_starts[chunk_idx], label_chunk_len)
        doa = gather_windows(doa_targets, l_starts[chunk_idx], label_chunk_len)
        if batch_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, batch_sharding)
            sed = jax.lax.with_sharding_constraint(sed, batch_sharding)
            doa = jax.lax.with_sharding_constraint(doa, batch_sharding)
        return base_step.__wrapped__(state, x, sed, doa, rng)

    def wav_step(state, waves, sed_targets, doa_targets, tables, chunk_idx, rng):
        if chunk_idx.ndim == 1:
            return one_step(state, waves, sed_targets, doa_targets, tables,
                            chunk_idx, rng)

        def body(st, idx):  # (K, B) chunk ids -> K fused optimizer steps
            st, metrics = one_step(st, waves, sed_targets, doa_targets, tables,
                                   idx, rng)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, chunk_idx)
        return state, metrics

    return jax.jit(wav_step, donate_argnums=(0,))


def make_eval_step(model, n_classes: int, output_format: str, interp_ratio: float):
    def eval_step(params, batch_stats, x):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        event_logit = interpolate_index_repeat(out["event_frame_logit"], interp_ratio)
        doa = interpolate_index_repeat(out["doa_frame_output"], interp_ratio)
        if output_format == "accdoa":
            xx = doa[..., :n_classes]
            yy = doa[..., n_classes : 2 * n_classes]
            zz = doa[..., 2 * n_classes :]
            event_prob = jnp.sqrt(xx**2 + yy**2 + zz**2)
        else:
            event_prob = jax.nn.sigmoid(event_logit)
        return event_prob, doa, event_logit

    return jax.jit(eval_step)


def make_val_loss_step(n_classes: int, loss_weight, output_format: str = "reg_xyz"):
    """Jitted validation losses reusing the training loss functions themselves
    (train/losses.py) — one set of formulas, no host-NumPy duplicate to drift.
    Prediction frames are trimmed to the target length; rows beyond n_real
    (pad_to_batch duplicates) are masked out of both loss terms."""
    from salsa_tpu.train.losses import accdoa_mse, bce_with_logits, masked_reg_loss

    def val_loss(event_logit, doa_pred, sed_gt, doa_gt, n_real):
        n = min(event_logit.shape[1], sed_gt.shape[1])
        logit, tgt = event_logit[:, :n], sed_gt[:, :n]
        row = (jnp.arange(logit.shape[0]) < n_real).astype(jnp.float32)
        # zeroing padded rows' SED mask removes them from the masked losses exactly
        mask = tgt * row[:, None, None]
        if output_format == "accdoa":
            doa_l = accdoa_mse(doa_pred[:, :n], doa_gt[:, :n], mask,
                               n_classes, n_real * n)
            return doa_l, jnp.zeros_like(doa_l), doa_l
        sed_l = bce_with_logits(logit, tgt, row_weights=row)
        doa_l = sum(
            masked_reg_loss(
                doa_pred[:, :n, i * n_classes : (i + 1) * n_classes],
                doa_gt[:, :n, i * n_classes : (i + 1) * n_classes],
                mask,
            )
            for i in range(3)
        )
        total = loss_weight[0] * sed_l + loss_weight[1] * doa_l
        return total, sed_l, doa_l

    return jax.jit(val_loss)


class SeldTrainer:
    def __init__(
        self,
        model,
        cfg,
        train_data,
        val_data,
        gt_meta_dir: str | None,
        submission_dir: str,
        joint_transform=None,
        feature_transform=None,
        mesh=None,
        seed: int = 2021,
        scaler=None,
    ):
        self.model = model
        self.cfg = cfg
        self._n_proc = jax.process_count()
        self._pid = jax.process_index()
        self.n_classes = cfg.data.n_classes
        self.output_format = cfg.data.get("output_format", "reg_xyz")
        self.label_rate = cfg.data.get("label_rate", 10)
        if mesh is None:
            # data-parallel width = largest device count that divides the batch
            import math

            n_data = math.gcd(cfg.training.train_batch_size, len(jax.devices()))
            mesh = make_mesh(n_data=n_data)
        self.mesh = mesh
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.gt_meta_dir = gt_meta_dir
        self.submission_dir = submission_dir
        self.eval_version = str(cfg.get("eval_version", "2021"))
        self.sed_threshold = cfg.get("sed_threshold", 0.3)
        self.doa_threshold = cfg.get("doa_threshold", 20)
        self.max_label_frames = int(cfg.data.get("max_file_len_s", 60) * self.label_rate)

        self.train_dataset = SeldChunkDataset(train_data, joint_transform, feature_transform)
        self.val_data = val_data
        self.val_dataset = SeldChunkDataset(val_data) if val_data is not None else None

        self.batch_size = cfg.training.train_batch_size
        if self._n_proc > 1:
            if self.batch_size % self._n_proc:
                raise ValueError(
                    f"train_batch_size {self.batch_size} not divisible by "
                    f"{self._n_proc} processes")
            if len(self.train_dataset) < self.batch_size:
                raise ValueError(
                    f"dataset ({len(self.train_dataset)} chunks) smaller than the "
                    f"global batch ({self.batch_size}): multi-host training drops "
                    "partial batches, so no step could run")
        self.max_epochs = cfg.training.max_epochs
        train_fraction = cfg.data.get("train_fraction", 1.0)
        self.steps_per_epoch = max(
            1, int(len(self.train_dataset) // self.batch_size * train_fraction)
        )
        total_steps = self.steps_per_epoch * self.max_epochs

        feature_rate = cfg.data.fs / cfg.data.hop_len
        enc_ratio = model.time_downsample_ratio
        self.interp_ratio = enc_ratio * self.label_rate / feature_rate

        tx = make_optimizer(
            total_steps,
            cfg.training.get("optimizer", "adam"),
            tuple(cfg.training.lr_scheduler.milestones),
            tuple(cfg.training.lr_scheduler.lrs),
            tuple(cfg.training.lr_scheduler.moms),
        )
        sample = train_data
        sample_x = jnp.zeros(
            (1, sample.features.shape[0], sample.feature_chunk_len,
             sample.features.shape[2]),
            jnp.float32,
        )
        self.state = create_train_state(model, sample_x, tx, seed=seed)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params))
        logger.info("model parameters: %.2fM | steps/epoch: %d | interp ratio: %.1f",
                    n_params / 1e6, self.steps_per_epoch, self.interp_ratio)
        self.state = self.state.replace(
            params=replicate(self.mesh, self.state.params),
            batch_stats=replicate(self.mesh, self.state.batch_stats),
            opt_state=replicate(self.mesh, self.state.opt_state),
        )

        loss_weight = tuple(cfg.training.get("loss_weight", (0.3, 0.7)))
        self._loss_weight = loss_weight
        augment_fn = None
        dev_aug = cfg.training.get("device_augment", False)
        if dev_aug:
            from salsa_tpu.train.device_augment import make_device_augment

            # device_augment: true (full reference stack) or "feature"
            # (feature-only transforms, no channel swaps — the ablation arm)
            augment_fn = make_device_augment(
                cfg.feature_type, cfg.data.audio_format, self.n_classes,
                train_data.feature_chunk_len, train_data.features.shape[2],
                mode=dev_aug if isinstance(dev_aug, str) else "full",
            )
            if joint_transform is not None or feature_transform is not None:
                logger.warning("device_augment enabled: host transforms are ignored")
                self.train_dataset = SeldChunkDataset(train_data)
        self._train_step = make_train_step(
            model, self.n_classes, loss_weight, self.output_format, self.interp_ratio,
            remat=cfg.training.get("remat", False), augment_fn=augment_fn,
            accdoa_silent_weight=float(
                cfg.training.get("accdoa_silent_weight", 0.0)),
        )
        # from_wav supersedes device_data (it IS resident mode, fed by waveforms)
        self.device_data = (cfg.training.get("device_data", False)
                            and not cfg.training.get("from_wav", False))
        self.device_data_shard = False
        if self.device_data:
            # whole split resident on device; host sends only chunk indices
            assert train_data.features.shape[1] > 0, (
                "device_data requires a preloaded split (preload=True)"
            )
            if augment_fn is None and (joint_transform or feature_transform):
                logger.warning("device_data: host transforms are bypassed — enable "
                               "training.device_augment for augmentation")
            store_dtype = (
                jnp.bfloat16
                if cfg.training.get("device_data_dtype", "float32") == "bfloat16"
                else jnp.float32
            )
            if (cfg.training.get("device_data_shard", False)
                    and self.mesh.shape.get("data", 1) > 1):
                self._setup_sharded_resident(train_data, store_dtype, augment_fn,
                                             loss_weight)
                self.device_data = False  # epoch loop takes the shard branch
                self.device_data_shard = True
            else:
                # the resident split replicates over the mesh so every device can
                # slice arbitrary chunk windows locally; per-step index vectors
                # are sharded along 'data' (see train_epoch), keeping the step
                # fully data-parallel under GSPMD rather than pinned to device 0
                self._dev_features = replicate(
                    self.mesh, jnp.asarray(train_data.features, dtype=store_dtype))
                self._dev_sed = replicate(self.mesh,
                                          jnp.asarray(train_data.sed_targets))
                self._dev_doa = replicate(self.mesh,
                                          jnp.asarray(train_data.doa_targets))
                self._train_step_resident = make_resident_train_step(
                    model, self.n_classes, loss_weight, self.output_format,
                    self.interp_ratio, train_data.feature_chunk_len,
                    train_data.label_chunk_len,
                    remat=cfg.training.get("remat", False), augment_fn=augment_fn,
                    mesh=self.mesh,
                    accdoa_silent_weight=float(
                        cfg.training.get("accdoa_silent_weight", 0.0)),
                )
                self._f_starts = np.asarray(train_data.feature_chunk_starts)
                self._l_starts = np.asarray(train_data.label_chunk_starts)
                from jax.sharding import NamedSharding, PartitionSpec as P

                # (K, B) multi-step index blocks shard along the batch axis
                self._starts_sharding = NamedSharding(self.mesh, P(None, "data"))
        from salsa_tpu.data.wav_database import WavSplitData

        # from_wav engages only when the train split actually is wav-resident —
        # an inference-time trainer (cli/infer.py) carries the training config
        # but a plain feature SplitData
        self.from_wav = (cfg.training.get("from_wav", False)
                         and isinstance(train_data, WavSplitData))
        if self.from_wav:
            self._setup_from_wav(train_data, scaler, augment_fn, loss_weight)
        self._eval_step = make_eval_step(
            model, self.n_classes, self.output_format, self.interp_ratio
        )
        self._val_loss_step = make_val_loss_step(self.n_classes, loss_weight,
                                                 self.output_format)
        self._dropout_rng = dropout_rng(seed)

        self.tb = None
        tb_dir = cfg.get("dir", {}).get("tb_dir") if hasattr(cfg, "get") else None
        if tb_dir and self._pid != 0:
            tb_dir = None  # multi-host: only process 0 writes event files
        if tb_dir:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(tb_dir)
            except Exception:  # pragma: no cover - TB optional
                self.tb = None

    # ------------------------------------------------------------------
    def _setup_sharded_resident(self, train_data, store_dtype, augment_fn,
                                loss_weight):
        """training.device_data_shard: re-lay the concatenated split as a
        per-clip tensor (n_clips_pad, C, T_clip_max, F) sharded over the data
        axis — per-device memory drops n_data-fold vs replication (VERDICT r2
        #4). Chunk sampling becomes shard-stratified (see _epoch_order)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = self.mesh.shape["data"]
        counts = np.asarray(train_data.clip_chunk_counts)
        n_clips = len(counts)
        if n_clips < n_data:
            raise ValueError(
                f"device_data_shard needs >= {n_data} clips (data-axis width); "
                f"split has {n_clips}")
        f_starts = np.asarray(train_data.feature_chunk_starts)
        clip_of_chunk = np.repeat(np.arange(n_clips), counts)
        first_chunk = np.concatenate([[0], np.cumsum(counts)[:-1]])
        clip_offsets = f_starts[first_chunk]        # clip start in concat frames
        total_T = train_data.features.shape[1]
        clip_lens = np.diff(np.concatenate([clip_offsets, [total_T]]))
        t_max = int(clip_lens.max())
        n_clips_pad = -(-n_clips // n_data) * n_data
        C, F = train_data.features.shape[0], train_data.features.shape[2]
        by_clip = np.zeros((n_clips_pad, C, t_max, F), dtype=np.float32)
        feats = train_data.features
        for ci in range(n_clips):
            o, L = int(clip_offsets[ci]), int(clip_lens[ci])
            by_clip[ci, :, :L] = feats[:, o : o + L]

        self._dev_features_sharded = shard_global(
            self.mesh, by_clip.astype(store_dtype), P("data"))
        self._dev_sed = replicate(self.mesh, jnp.asarray(train_data.sed_targets))
        self._dev_doa = replicate(self.mesh, jnp.asarray(train_data.doa_targets))

        m = n_clips_pad // n_data                    # clips per shard
        self._shard_clip_local = (clip_of_chunk % m).astype(np.int32)
        self._shard_f0 = (f_starts - clip_offsets[clip_of_chunk]).astype(np.int32)
        self._shard_l_starts = np.asarray(train_data.label_chunk_starts, np.int32)
        shard_of_chunk = clip_of_chunk // m
        self._shard_chunk_ids = [np.where(shard_of_chunk == d)[0]
                                 for d in range(n_data)]
        self._n_shards = n_data
        if self.batch_size % n_data:
            raise ValueError(f"batch {self.batch_size} not divisible by "
                             f"data axis {n_data} (device_data_shard)")
        per = self.batch_size // n_data
        balanced_steps = min(len(s) // per for s in self._shard_chunk_ids)
        if balanced_steps < self.steps_per_epoch:
            logger.warning(
                "device_data_shard: unbalanced clip shards cap the epoch at %d "
                "steps (was %d)", balanced_steps, self.steps_per_epoch)
            self.steps_per_epoch = max(1, balanced_steps)

        self._train_step_shard = make_sharded_resident_train_step(
            self.model, self.n_classes, loss_weight, self.output_format,
            self.interp_ratio, train_data.feature_chunk_len,
            train_data.label_chunk_len,
            remat=self.cfg.training.get("remat", False), augment_fn=augment_fn,
            mesh=self.mesh,
            accdoa_silent_weight=float(
                self.cfg.training.get("accdoa_silent_weight", 0.0)),
        )
        self._starts_sharding = NamedSharding(self.mesh, P(None, "data"))
        logger.info(
            "device_data_shard: %d clips over %d shards (%d/dev, %.2f GB/dev vs "
            "%.2f replicated)", n_clips, n_data, m,
            by_clip.nbytes / n_data / 1e9, by_clip.nbytes / 1e9)

    def _setup_from_wav(self, train_data, scaler, augment_fn, loss_weight):
        """Fused raw-wav training (training.from_wav: true): device-resident
        waveforms + per-chunk in-graph feature extraction. See
        make_wav_resident_train_step and features/chunked.py."""
        from salsa_tpu.data.wav_database import WavSplitData
        from salsa_tpu.features.chunked import make_chunk_extractor
        from salsa_tpu.features.registry import feature_n_spec_channels

        if not isinstance(train_data, WavSplitData):
            raise ValueError("training.from_wav requires a WavSplitData train "
                             "split (cli/train.py builds it from audio_root_dir)")
        if scaler is None:
            raise ValueError("training.from_wav requires a fitted scaler "
                             "(wav_database.fit_scaler_from_waves)")
        cfg, d = self.cfg, self.cfg.data
        chunk_len = train_data.feature_chunk_len
        chunk_fn, fparams = make_chunk_extractor(
            cfg.feature_type, d.audio_format, chunk_len,
            fs=d.fs, n_fft=d.n_fft, hop_length=d.hop_len,
            win_length=d.get("win_len", None),
            fmin_doa=d.get("fmin_doa", 50), fmax_doa=d.get("fmax_doa", None),
            n_mels=d.get("n_mels", 128), fmin=d.get("fmin", 50),
            fmax=d.get("fmax", None),
            eig_method=cfg.training.get("eig_method", "auto"),
        )
        n_chunks = len(train_data)
        needs_tracker = cfg.feature_type == "salsa" and fparams.is_tracking
        if needs_tracker:
            from salsa_tpu.features.chunked import salsa_tracker_checkpoints_batch

            nb = fparams.upper_bin - fparams.lower_bin
            floor_ck = np.zeros((n_chunks, nb), np.float32)
            cd_ck = np.zeros((n_chunks, nb), np.int32)
            t0 = time.time()
            # batched per equal clip length — dispatches cost seconds on the
            # remote harness, so per-clip calls would dominate startup.
            # Dequantized RESIDENT samples, not the original float wave: the
            # checkpoint must match the in-step tracker input bit-for-bit.
            by_len: dict[int, list[int]] = {}
            for ci, wav in enumerate(train_data.clip_wavs):
                by_len.setdefault(wav.shape[1], []).append(ci)
            for L, cis in by_len.items():
                s_pad = L + 2 * train_data.wav_pad
                waves_grp = (train_data.waves[cis][:, :, :s_pad]
                             .astype(np.float32) * train_data.wav_scale)
                starts_list = [
                    train_data.within_clip_start[train_data.clip_of_chunk == ci]
                    for ci in cis]
                for ci, (f, c) in zip(cis, salsa_tracker_checkpoints_batch(
                        waves_grp, starts_list, fparams)):
                    sel = train_data.clip_of_chunk == ci
                    floor_ck[sel], cd_ck[sel] = f, c
            logger.info("from_wav: tracker checkpoints for %d clips in %.1fs",
                        len(train_data.clip_wavs), time.time() - t0)
        else:
            floor_ck = np.zeros((n_chunks, 1), np.float32)
            cd_ck = np.zeros((n_chunks, 1), np.int32)

        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = lambda a: replicate(self.mesh, jnp.asarray(a))
        n_data = self.mesh.shape.get("data", 1)
        clip_sharded = (cfg.training.get("device_data_shard", False)
                        and n_data > 1)
        clip_of_chunk = train_data.clip_of_chunk.astype(np.int32)
        if clip_sharded:
            # waves sharded over the data axis on the clip axis (VERDICT r2 #4
            # applied to the from_wav flagship): per-device HBM = 1/n_data of
            # the corpus; epoch order becomes shard-stratified (_epoch_order)
            n_clips = train_data.waves.shape[0]
            if n_clips < n_data:
                raise ValueError(
                    f"device_data_shard needs >= {n_data} clips; have {n_clips}")
            n_clips_pad = -(-n_clips // n_data) * n_data
            waves = train_data.waves
            if n_clips_pad > n_clips:
                waves = np.concatenate([waves, np.zeros(
                    (n_clips_pad - n_clips,) + waves.shape[1:], waves.dtype)])
            m = n_clips_pad // n_data
            self._dev_waves = shard_global(self.mesh, waves, P("data"))
            shard_of_chunk = clip_of_chunk // m
            self._shard_chunk_ids = [np.where(shard_of_chunk == d)[0]
                                     for d in range(n_data)]
            self._n_shards = n_data
            if self.batch_size % n_data:
                raise ValueError(f"batch {self.batch_size} not divisible by "
                                 f"data axis {n_data} (device_data_shard)")
            per = self.batch_size // n_data
            balanced = min(len(s) // per for s in self._shard_chunk_ids)
            if balanced < self.steps_per_epoch:
                logger.warning(
                    "device_data_shard: unbalanced clip shards cap the epoch at "
                    "%d steps (was %d)", balanced, self.steps_per_epoch)
                self.steps_per_epoch = max(1, balanced)
            clip_table = (clip_of_chunk % m).astype(np.int32)  # shard-local
            logger.info("from_wav shard: %d clips over %d shards (%.2f GB/dev)",
                        n_clips, n_data, waves.nbytes / n_data / 1e9)
        else:
            self._dev_waves = rep(train_data.waves)
            clip_table = clip_of_chunk
        self._dev_sed = rep(train_data.sed_targets)
        self._dev_doa = rep(train_data.doa_targets)
        n_valid = np.minimum(
            train_data.clip_trimmed_frames[train_data.clip_of_chunk]
            - train_data.within_clip_start, chunk_len).astype(np.int32)
        self._wav_tables = tuple(rep(a) for a in (
            clip_table,
            train_data.within_clip_start.astype(np.int32),
            train_data.clip_full_frames[train_data.clip_of_chunk].astype(np.int32),
            n_valid,
            np.asarray(train_data.label_chunk_starts, np.int32),
            floor_ck, cd_ck,
        ))
        self._train_step_wav = make_wav_resident_train_step(
            self.model, self.n_classes, loss_weight, self.output_format,
            self.interp_ratio, chunk_len, train_data.label_chunk_len,
            chunk_fn, scaler, feature_n_spec_channels(cfg.feature_type),
            train_data.wav_scale,
            remat=cfg.training.get("remat", False), augment_fn=augment_fn,
            mesh=self.mesh, clip_sharded=clip_sharded,
            accdoa_silent_weight=float(
                cfg.training.get("accdoa_silent_weight", 0.0)),
        )
        self._starts_sharding = NamedSharding(self.mesh, P(None, "data"))

    # ------------------------------------------------------------------
    def restore(self, resume_from: str) -> int:
        """Restore train state from a checkpoint and re-commit it to the mesh.

        restore_checkpoint returns host-numpy leaves; they are pushed through the
        same `replicate` placement the initial state got. Multi-host REQUIRES
        this (every process restores the same file and make_replicated turns the
        identical host values into global arrays — feeding host leaves straight
        into the donated sharded step dies on non-addressable arrays);
        single-process it replaces lazy re-commit with an explicit placement.
        Returns the epoch to continue from."""
        self.state = ckpt.restore_checkpoint(resume_from, self.state)
        self.state = self.state.replace(
            params=replicate(self.mesh, self.state.params),
            batch_stats=replicate(self.mesh, self.state.batch_stats),
            opt_state=replicate(self.mesh, self.state.opt_state),
        )
        # Prefer the sidecar's recorded epoch: step // steps_per_epoch drifts when
        # steps_per_epoch changed between runs (different train_fraction, dataset
        # size, or a shard-balance cap) — the schedule is step-based so quality is
        # unaffected, but epoch numbering / remaining-epoch accounting must not be.
        meta = ckpt.load_metadata(resume_from)
        if "epoch" in meta:
            start_epoch = int(meta["epoch"]) + 1
        else:
            start_epoch = int(self.state.step) // self.steps_per_epoch
        logger.info("Resumed from %s at step %d (epoch %d)",
                    resume_from, self.state.step, start_epoch)
        return start_epoch

    def fit(self, resume_from: str | None = None):
        if self._n_proc > 1:
            # re-align wall clocks before the first collective-bearing dispatch
            # (data loading / scaler fitting / tracker checkpointing above can
            # skew processes past gloo's 30 s communicator rendezvous timeout)
            from salsa_tpu.parallel.distributed import barrier

            barrier("fit_start")
        start_epoch = 0
        if resume_from:
            start_epoch = self.restore(resume_from)
        best_seld = float("inf")
        ckpt_dir = self.cfg.dir.model.checkpoint
        best_dir = self.cfg.dir.model.best
        val_interval = self.cfg.training.get("val_interval", 1)
        backend = self.cfg.training.get("checkpoint_backend", "msgpack")
        t0 = time.time()
        for epoch in range(start_epoch, self.max_epochs):
            metrics = self.train_epoch(epoch)
            if not np.isfinite(metrics.get("loss", 0.0)):
                # failure detection: surface divergence immediately instead of
                # silently training on NaNs (the last finite checkpoint remains on
                # disk for resume)
                logger.error("Epoch %d: non-finite loss %s — stopping. Resume from "
                             "the last checkpoint with a lower LR.", epoch, metrics)
                raise FloatingPointError(f"training diverged at epoch {epoch}")
            logger.info(
                "Epoch %d/%d - loss %.4f (sed %.4f, doa %.4f) - %.1fs elapsed",
                epoch, self.max_epochs - 1, metrics["loss"],
                metrics["sed_loss"], metrics["doa_loss"], time.time() - t0,
            )
            meta: dict[str, Any] = {"epoch": epoch, **metrics}
            # multi-host: validation (host-side CSV writing + scoring) and all
            # checkpoint writes happen on process 0 only; the eval step below runs
            # on local devices from fetched replicated params, so non-primary
            # processes skipping it cannot deadlock a collective
            if self._n_proc > 1 and self._pid != 0:
                continue
            if self.val_dataset is not None and (epoch + 1) % val_interval == 0:
                scores = self.validate()
                meta.update({f"val{k}": v for k, v in scores.items()
                             if k != "seld_error"})  # stored as valSeld below
                logger.info(
                    "Epoch %d - val SELD %.4f - ER %.4f F1 %.4f LE %.2f LR %.4f",
                    epoch, scores["seld_error"], scores["ER"], scores["F1"],
                    scores["LE"], scores["LR"],
                )
                if self.tb:
                    for k, v in scores.items():
                        self.tb.add_scalar(f"val/{k}", v, int(self.state.step))
                meta["valSeld"] = scores["seld_error"]
                if scores["seld_error"] < best_seld:
                    best_seld = scores["seld_error"]
                    ckpt.save_checkpoint(best_dir, "best", self.state, meta, backend=backend)
                    logger.info("New best valSeld %.4f saved", best_seld)
            ckpt.save_checkpoint(ckpt_dir, f"epoch{epoch:03d}", self.state, meta, backend=backend)
        return self.state

    def _shuffle_rng(self, epoch: int) -> np.random.Generator:
        """Epoch shuffle randomness as a PURE function of (seed, epoch) — never a
        stateful generator. Multi-host requires every process to compute the SAME
        global order (ADVICE r2: a drifted per-process generator silently
        corrupts every batch), and resume requires epoch N's order to be
        independent of how many epochs this process actually executed."""
        return np.random.default_rng((self.seed, epoch))

    def _epoch_order(self, epoch: int) -> np.ndarray:
        """Chunk visit order for one epoch. Plain modes: a global shuffle.
        device_data_shard: shard-STRATIFIED — every batch's column block d holds
        exactly batch/n_shards chunks from shard d's clips, so the shard_map
        window gather is purely local. Pure function of (seed, epoch)."""
        rng = self._shuffle_rng(epoch)
        if getattr(self, "_shard_chunk_ids", None) is not None:
            per = self.batch_size // self._n_shards
            streams = []
            for ids in self._shard_chunk_ids:
                ids = ids.copy()
                rng.shuffle(ids)
                streams.append(ids)
            steps = min(len(s) // per for s in streams)
            order = np.empty(steps * self.batch_size, dtype=np.int64)
            for t in range(steps):
                base = t * self.batch_size
                for d, s in enumerate(streams):
                    order[base + d * per : base + (d + 1) * per] = (
                        s[t * per : (t + 1) * per])
            return order
        order = np.arange(len(self.train_dataset))
        rng.shuffle(order)
        return order

    def train_epoch(self, epoch: int) -> dict:
        count = 0
        pending = []
        # order matters: from_wav with device_data_shard sets _shard_chunk_ids
        # (stratified order) but dispatches through the wav step
        if not self.from_wav and getattr(self, "_shard_chunk_ids", None) is not None:
            order = self._epoch_order(epoch)
            K = int(self.cfg.training.get("steps_per_dispatch", 8))
            usable = min(self.steps_per_epoch * self.batch_size, len(order))
            i = 0
            while i < usable:
                k = min(K, (usable - i) // self.batch_size)
                if k == 0:
                    break
                idx = order[i : i + k * self.batch_size].reshape(k, self.batch_size)
                if self._n_proc > 1:
                    # each process contributes only its own batch columns (the
                    # stratified order puts shard d's chunks in column block d,
                    # and the mesh data axis lists each process's devices
                    # contiguously, so local columns == local device shards)
                    from salsa_tpu.parallel.distributed import local_batch_slice

                    sel = idx[:, local_batch_slice(self.batch_size)]
                    put = lambda a: jax.make_array_from_process_local_data(
                        self._starts_sharding, np.ascontiguousarray(a))
                else:
                    sel = idx
                    put = lambda a: jax.device_put(a, self._starts_sharding)
                self.state, metrics = self._train_step_shard(
                    self.state, self._dev_features_sharded, self._dev_sed,
                    self._dev_doa, put(self._shard_clip_local[sel]),
                    put(self._shard_f0[sel]), put(self._shard_l_starts[sel]),
                    self._dropout_rng,
                )
                pending.append(jax.tree.map(jnp.sum, metrics))
                count += k
                i += k * self.batch_size
            return self._finish_epoch(pending, count)
        if self.from_wav:
            order = self._epoch_order(epoch)
            K = int(self.cfg.training.get("steps_per_dispatch", 8))
            usable = min(self.steps_per_epoch * self.batch_size, len(order))
            i = 0
            while i < usable:
                k = min(K, (usable - i) // self.batch_size)
                if k == 0:
                    break
                idx = order[i : i + k * self.batch_size].reshape(k, self.batch_size)
                if self._n_proc > 1:
                    from salsa_tpu.parallel.distributed import local_batch_slice

                    local = idx[:, local_batch_slice(self.batch_size)]
                    idx_dev = jax.make_array_from_process_local_data(
                        self._starts_sharding, local.astype(np.int32))
                else:
                    idx_dev = jax.device_put(idx.astype(np.int32),
                                             self._starts_sharding)
                self.state, metrics = self._train_step_wav(
                    self.state, self._dev_waves, self._dev_sed, self._dev_doa,
                    self._wav_tables, idx_dev, self._dropout_rng,
                )
                pending.append(jax.tree.map(jnp.sum, metrics))
                count += k
                i += k * self.batch_size
            return self._finish_epoch(pending, count)
        if self.device_data:
            order = self._epoch_order(epoch)
            K = int(self.cfg.training.get("steps_per_dispatch", 8))
            usable = self.steps_per_epoch * self.batch_size
            i = 0
            while i < usable:
                k = min(K, (usable - i) // self.batch_size)
                if k == 0:
                    break
                idx = order[i : i + k * self.batch_size].reshape(k, self.batch_size)
                if self._n_proc > 1:
                    # each process contributes only its own batch columns
                    from salsa_tpu.parallel.distributed import local_batch_slice

                    local = idx[:, local_batch_slice(self.batch_size)]
                    f_st = jax.make_array_from_process_local_data(
                        self._starts_sharding, self._f_starts[local].astype(np.int32))
                    l_st = jax.make_array_from_process_local_data(
                        self._starts_sharding, self._l_starts[local].astype(np.int32))
                else:
                    f_st = jax.device_put(self._f_starts[idx].astype(np.int32),
                                          self._starts_sharding)
                    l_st = jax.device_put(self._l_starts[idx].astype(np.int32),
                                          self._starts_sharding)
                self.state, metrics = self._train_step_resident(
                    self.state, self._dev_features, self._dev_sed, self._dev_doa,
                    f_st, l_st, self._dropout_rng,
                )
                pending.append(jax.tree.map(jnp.sum, metrics))
                count += k
                i += k * self.batch_size
            return self._finish_epoch(pending, count)
        multihost = self._n_proc > 1
        it = prefetch(batch_iterator(
            self.train_dataset, self.batch_size, shuffle=True,
            rng=self._shuffle_rng(epoch),
            drop_last=multihost or len(self.train_dataset) >= self.batch_size,
            process_shard=(self._pid, self._n_proc) if multihost else None,
            num_workers=int(self.cfg.training.get("data_workers", 0)),
        ))
        for x, sed, doa, _names, _n in it:
            if multihost:
                from salsa_tpu.parallel.distributed import global_batch_from_local

                batch = global_batch_from_local(self.mesh, (x, sed, doa))
            else:
                batch = shard_batch(self.mesh, (x, sed, doa))
            self.state, metrics = self._train_step(
                self.state, *batch, self._dropout_rng
            )
            pending.append(metrics)  # stays on device; fetched once per epoch
            count += 1
            if count >= self.steps_per_epoch:
                break
        return self._finish_epoch(pending, count)

    def _finish_epoch(self, pending, count) -> dict:
        sums: dict[str, float] = {}
        for metrics in jax.device_get(pending):
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        avgs = {k: v / max(count, 1) for k, v in sums.items()}
        hp = getattr(self.state.opt_state, "hyperparams", None)
        if hp is not None:
            avgs["lr"] = float(jax.device_get(hp["learning_rate"]))
            avgs["momentum"] = float(jax.device_get(hp["b1"]))
        if self.tb:
            for k, v in avgs.items():
                self.tb.add_scalar(f"train/{k}", v, int(self.state.step))
        return avgs

    # ------------------------------------------------------------------
    def _tta_fold(self, K: int, x_shape) -> int:
        """Variants per eval dispatch: the largest power-of-two divisor of K
        whose folded batch stays under the element budget (bounds activation
        memory for 60 s eval chunks; K always is a power of two)."""
        budget = float(self.cfg.training.get("tta_elements_per_dispatch", 2e8))
        per_variant = float(np.prod(x_shape))
        fold = K
        while fold > 1 and fold * per_variant > budget:
            fold //= 2
        return max(1, fold)

    def predict_split(self, split_data, submission_dir: str,
                      combine_method: str = "mean", tta=None,
                      output_pred_dir: str | None = None) -> list[str]:
        """Run inference over a val/test split and write one submission CSV per clip.
        With `tta` (a ChannelSwapTTA), predictions are averaged over all spatial
        symmetry variants with DOA outputs mapped back through the inverse label
        transform. Returns the list of CSV filenames written."""
        from salsa_tpu.train.submission import combine_chunks, write_classwise_csv

        os.makedirs(submission_dir, exist_ok=True)
        eval_params, eval_stats = self.state.params, self.state.batch_stats
        if self._n_proc > 1:
            # params live on the global mesh; fetch the (replicated, hence locally
            # addressable) values so the eval jit runs on this process's devices
            # without cross-host collectives
            eval_params = jax.device_get(eval_params)
            eval_stats = jax.device_get(eval_stats)
        ds = SeldChunkDataset(split_data)
        if output_pred_dir:
            os.makedirs(output_pred_dir, exist_ok=True)
        label_chunk_len = split_data.label_chunk_len
        label_chunk_hop = split_data.label_chunk_hop

        # Stage 1 — evaluate every chunk in clip order through fixed-shape
        # dispatches (batching decoupled from clip boundaries, so splits mixing
        # clip durations are exact; the reference assumes uniform chunks_per_clip,
        # datamodule.py:116-124).
        bs = min(max(split_data.chunks_per_clip, 8), max(1, len(ds)))
        probs, doas = [], []
        loss_sums: dict[str, float] = {}
        for x, sed_gt, doa_gt, _names, n_real in batch_iterator(
            ds, bs, shuffle=False, pad_to_batch=True,
            num_workers=int(self.cfg.training.get("data_workers", 0)),
        ):
            if tta is None:
                event_prob, doa, event_logit = self._eval_step(
                    eval_params, eval_stats, jnp.asarray(x)
                )
                if np.any(sed_gt):
                    tot, sl, dl = self._val_loss_step(
                        event_logit, doa, jnp.asarray(sed_gt), jnp.asarray(doa_gt),
                        n_real,
                    )
                    # weight by real rows so short tail batches don't skew the mean
                    loss_sums["val_loss"] = loss_sums.get("val_loss", 0.0) + float(tot) * n_real
                    loss_sums["val_sed_loss"] = loss_sums.get("val_sed_loss", 0.0) + float(sl) * n_real
                    loss_sums["val_doa_loss"] = loss_sums.get("val_doa_loss", 0.0) + float(dl) * n_real
                    loss_sums["_n"] = loss_sums.get("_n", 0) + n_real
            else:
                # symmetry variants FOLDED into the batch dimension: one dispatch
                # per variant-group instead of len(tta) dispatches per batch
                # (VERDICT r2 weak #2). Group size is the largest power-of-two
                # divisor of K fitting the element budget, so dispatch shapes
                # stay static across batches.
                K = len(tta)
                fold = self._tta_fold(K, x.shape)
                xs = np.stack([tta.transform_features(np.asarray(x), i)
                               for i in range(K)])          # (K, bs, C, T, F)
                ev_acc = doa_acc = None
                for g in range(0, K, fold):
                    flat = xs[g : g + fold].reshape(-1, *x.shape[1:])
                    ev, dd, logit = self._eval_step(
                        eval_params, eval_stats, jnp.asarray(flat)
                    )
                    ev = np.asarray(ev).reshape(fold, x.shape[0], *ev.shape[1:])
                    dd = np.asarray(dd).reshape(fold, x.shape[0], *dd.shape[1:])
                    if g == 0 and np.any(sed_gt):
                        # val losses from the IDENTITY variant (mask 0), so
                        # --tta inference still reports them
                        id_logit = np.asarray(logit).reshape(
                            fold, x.shape[0], *logit.shape[1:])[0]
                        tot, sl, dl = self._val_loss_step(
                            jnp.asarray(id_logit), jnp.asarray(dd[0]),
                            jnp.asarray(sed_gt), jnp.asarray(doa_gt), n_real)
                        loss_sums["val_loss"] = loss_sums.get("val_loss", 0.0) + float(tot) * n_real
                        loss_sums["val_sed_loss"] = loss_sums.get("val_sed_loss", 0.0) + float(sl) * n_real
                        loss_sums["val_doa_loss"] = loss_sums.get("val_doa_loss", 0.0) + float(dl) * n_real
                        loss_sums["_n"] = loss_sums.get("_n", 0) + n_real
                    for j in range(fold):
                        mapped = tta.inverse_doa(dd[j], g + j)
                        ev_acc = ev[j] if ev_acc is None else ev_acc + ev[j]
                        doa_acc = mapped if doa_acc is None else doa_acc + mapped
                event_prob = ev_acc / K
                doa = doa_acc / K
            probs.append(np.asarray(event_prob)[:n_real])
            doas.append(np.asarray(doa)[:n_real])
        probs = np.concatenate(probs, axis=0)
        doas = np.concatenate(doas, axis=0)

        # Stage 2 — regroup per clip, recombine overlaps, write submissions.
        if split_data.clip_chunk_counts is not None:
            clip_names = split_data.unique_clip_names
            counts = split_data.clip_chunk_counts
            label_frames = np.minimum(split_data.clip_label_frames,
                                      self.max_label_frames)
        else:  # hand-built SplitData without per-clip tables: uniform clips
            k = max(1, split_data.chunks_per_clip)
            if len(ds) % k != 0:
                raise ValueError(
                    f"SplitData has no clip_chunk_counts table but its {len(ds)} "
                    f"chunks are not a multiple of chunks_per_clip={k}; "
                    "non-uniform splits must carry per-clip tables")
            counts = np.full(len(ds) // k, k, dtype=np.int64)
            clip_names = split_data.clip_names[::k]
            label_frames = np.full(len(counts), self.max_label_frames, dtype=np.int64)
        written = []
        sed_t, doa_t = split_data.sed_targets, split_data.doa_targets
        i = l_ptr = 0
        for ci, name in enumerate(clip_names):
            k = int(counts[ci])
            n_label = int(label_frames[ci])
            l_starts = split_data.label_chunk_starts
            padded_label = int(l_starts[i + k - 1] - l_starts[i]) + label_chunk_len
            if k == 1:
                ep, dp = probs[i][:n_label], doas[i][:n_label]
            else:
                ep = combine_chunks(probs[i : i + k], label_chunk_len,
                                    label_chunk_hop, n_label, combine_method)
                dp = combine_chunks(doas[i : i + k], label_chunk_len,
                                    label_chunk_hop, n_label, combine_method)
            fn = name + ".csv"
            write_classwise_csv(
                os.path.join(submission_dir, fn), ep, dp, self.n_classes,
                sed_threshold=self.sed_threshold, max_frames=n_label,
                version=self.eval_version,
            )
            written.append(fn)
            if output_pred_dir:
                # raw prediction dump (parity with reference interfaces.py:182-202)
                import h5py

                with h5py.File(os.path.join(output_pred_dir, name + ".h5"), "w") as hf:
                    hf.create_dataset("event_frame_pred", data=ep[None], dtype=np.float32)
                    hf.create_dataset("doa_frame_pred", data=dp[None], dtype=np.float32)
                    hf.create_dataset("event_frame_gt",
                                      data=sed_t[l_ptr : l_ptr + n_label][None],
                                      dtype=np.float32)
                    hf.create_dataset("doa_frame_gt",
                                      data=doa_t[l_ptr : l_ptr + n_label][None],
                                      dtype=np.float32)
            i += k
            l_ptr += padded_label
        n_loss = loss_sums.pop("_n", 0)
        self.last_val_losses = (
            {k: v / n_loss for k, v in loss_sums.items()} if n_loss else {}
        )
        return written

    def validate(self) -> dict:
        tmp_dir = os.path.join(self.submission_dir, "_temp")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        val_data = self.val_data
        val_fraction = float(self.cfg.data.get("val_fraction", 1.0))
        if val_fraction < 1.0 and val_data.clip_chunk_counts is not None:
            from salsa_tpu.data.database import truncate_clips

            n = int(np.ceil(len(val_data.unique_clip_names) * val_fraction))
            val_data = truncate_clips(val_data, n)
        written = self.predict_split(val_data, tmp_dir)
        if getattr(self, "last_val_losses", None):
            logger.info(
                "val losses: total %.4f (sed %.4f, doa %.4f)",
                self.last_val_losses["val_loss"],
                self.last_val_losses["val_sed_loss"],
                self.last_val_losses["val_doa_loss"],
            )
            if self.tb:
                for k, v in self.last_val_losses.items():
                    self.tb.add_scalar(f"val/{k}", v, int(self.state.step))
        return evaluate_submissions(
            tmp_dir,
            self.gt_meta_dir,
            version=self.eval_version,
            n_classes=self.n_classes,
            doa_threshold=self.doa_threshold,
            label_rate=self.label_rate,
            filenames=written,
        )
