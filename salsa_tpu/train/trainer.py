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
from salsa_tpu.parallel.mesh import make_mesh, shard_batch, replicate
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
        if cfg.training.get("device_augment", False):
            from salsa_tpu.train.device_augment import make_device_augment

            augment_fn = make_device_augment(
                cfg.feature_type, cfg.data.audio_format, self.n_classes,
                train_data.feature_chunk_len, train_data.features.shape[2],
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
        self.device_data = cfg.training.get("device_data", False)
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
            # the resident split replicates over the mesh so every device can
            # slice arbitrary chunk windows locally; per-step index vectors are
            # sharded along 'data' (see train_epoch), keeping the step fully
            # data-parallel under GSPMD rather than pinned to device 0
            self._dev_features = replicate(
                self.mesh, jnp.asarray(train_data.features, dtype=store_dtype))
            self._dev_sed = replicate(self.mesh, jnp.asarray(train_data.sed_targets))
            self._dev_doa = replicate(self.mesh, jnp.asarray(train_data.doa_targets))
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
    def fit(self, resume_from: str | None = None):
        start_epoch = 0
        if resume_from:
            self.state = ckpt.restore_checkpoint(resume_from, self.state)
            start_epoch = int(self.state.step) // self.steps_per_epoch
            logger.info("Resumed from %s at step %d (epoch %d)",
                        resume_from, self.state.step, start_epoch)
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

    def train_epoch(self, epoch: int) -> dict:
        count = 0
        pending = []
        if self.device_data:
            order = np.arange(len(self._f_starts))
            self.rng.shuffle(order)
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
            self.train_dataset, self.batch_size, shuffle=True, rng=self.rng,
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
                ev_acc = doa_acc = None
                for i in range(len(tta)):
                    xt = tta.transform_features(np.asarray(x), i)
                    ev, dd, _ = self._eval_step(
                        eval_params, eval_stats, jnp.asarray(xt)
                    )
                    ev = np.asarray(ev)
                    dd = tta.inverse_doa(np.asarray(dd), i)
                    ev_acc = ev if ev_acc is None else ev_acc + ev
                    doa_acc = dd if doa_acc is None else doa_acc + dd
                event_prob = ev_acc / len(tta)
                doa = doa_acc / len(tta)
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
