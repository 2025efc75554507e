"""Multi-host (multi-process) execution support.

The reference has no distributed machinery at all (SURVEY.md §2.6); here multi-host
runs are first-class, the TPU way: every process runs the same program,
`jax.distributed.initialize` forms the global runtime, the `Mesh` spans all
processes' devices, and GSPMD handles every collective. The host side only has to

  * feed each process its shard of the global batch
    (`global_batch_from_local` wraps `jax.make_array_from_process_local_data`),
  * materialize replicated values as global arrays (`replicate` in mesh.py calls
    `make_replicated` here when process_count > 1), and
  * confine filesystem writes (checkpoints, submissions, logs) to process 0
    (`is_primary`).

Tested by tests/test_multihost.py: 2 CPU processes × 4 virtual devices each train
the same synthetic problem and must produce losses identical to a single-process
8-device run.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Form the global JAX runtime across processes.

    With no arguments, auto-detects cluster environments the way
    `jax.distributed.initialize()` does (TPU pod metadata, SLURM, Open MPI);
    explicit args are for manual launches:

        SALSA_COORDINATOR=host:port SALSA_NUM_PROCESSES=2 SALSA_PROCESS_ID=i

    environment variables are honored as a fallback when args are None.
    No-op when neither args, env vars, nor an auto-detectable cluster exist.
    """
    coordinator_address = coordinator_address or os.environ.get("SALSA_COORDINATOR")
    if num_processes is None and "SALSA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SALSA_NUM_PROCESSES"])
    if process_id is None and "SALSA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SALSA_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process run; nothing to form
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align every process at a named COORDINATION-SERVICE barrier — unlike
    `multihost_utils.sync_global_devices` this is not a device collective, so
    it works before any gloo/ICI communicator exists and is the right fence
    ahead of the first collective-bearing dispatch: gloo's communicator
    rendezvous has a hard 30 s timeout, which heavily skewed process setup
    (big first-step compiles timesharing a small host) can overshoot.
    No-op single-process."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def is_primary() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def local_batch_slice(global_batch_size: int) -> slice:
    """The [start:stop) rows of a global batch this process is responsible for.
    The batch must divide evenly by process count (enforced)."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n_proc} processes")
    per = global_batch_size // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def global_batch_from_local(mesh, local_batch, spec=None):
    """Assemble global device arrays from each process's local shard (leading-dim
    sharded along the mesh 'data' axis). `local_batch` is a pytree of host arrays
    holding only this process's rows."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))

    def put(x):
        x = np.asarray(x)
        sh = sharding if x.ndim >= 1 else NamedSharding(mesh, P())
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, local_batch)


def make_replicated(mesh, tree):
    """Fully replicate host values over a (possibly multi-process) mesh. Every
    process must pass identical values (same-seed init or same file read)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(put, tree)
