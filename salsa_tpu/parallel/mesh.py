"""Device mesh + sharding helpers.

TPU-native parallelism for this workload (see SURVEY.md §2.6): the reference has no
distributed machinery at all — here scaling is first-class via `jax.sharding`:

  * training: batch data-parallelism over the 'data' mesh axis — the jitted train
    step consumes a batch sharded along axis 0 and XLA inserts the gradient psum over
    ICI automatically (GSPMD);
  * large layers can additionally be sharded over the 'model' axis (tensor
    parallelism) by passing a 2-D mesh; parameter PartitionSpecs are chosen by
    `param_sharding` below;
  * feature extraction fans out embarrassingly parallel over chips: one clip per
    device via the same batch sharding.

Everything works unchanged on a single chip (mesh of one device).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Put a pytree of host arrays onto the mesh, sharded along leading (batch) dim.
    Single-process only; multi-host feeds shards via
    distributed.global_batch_from_local instead."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh (multi-process safe: every process
    must hold identical host values, e.g. same-seed init)."""
    if jax.process_count() > 1:
        from salsa_tpu.parallel.distributed import make_replicated

        return make_replicated(mesh, tree)
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_global(mesh: Mesh, x, spec: P):
    """Lay one host array onto the mesh with the given PartitionSpec —
    multi-process safe counterpart of `jax.device_put(x, NamedSharding(...))`
    for values every process holds in FULL and identically (e.g. a resident
    split each process loaded itself): each process materializes only the
    shards its local devices own."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def param_sharding(mesh: Mesh, params):
    """PartitionSpecs for model parameters: shard the largest dense/recurrent matrices
    over the 'model' axis (last dim), replicate the rest. With a 1-sized model axis
    this degenerates to full replication."""
    n_model = mesh.shape["model"]

    def spec_for(path, x):
        if n_model > 1 and getattr(x, "ndim", 0) >= 2 and x.shape[-1] % n_model == 0 \
                and x.size >= 1 << 16:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_param_sharding(mesh: Mesh, params):
    shardings = param_sharding(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
