"""Profiling utilities (the reference only has wall-clock prints; see SURVEY §5).

* `stage_timer` — lightweight named wall-clock stages with a summary table.
* `trace` — context manager around jax.profiler for XLA/TPU traces viewable in
  TensorBoard or Perfetto.
* `device_timer` — robust kernel timing: some PJRT transports make
  `block_until_ready` a no-op, so timing fences on fetching a checksum scalar to
  host instead.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np

from salsa_tpu.utils.experiments import logger


class stage_timer:
    """Accumulates wall-clock per named stage.

    with timers.stage('stft'): ...
    timers.summary()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [
            f"{name:24s} {self.totals[name]:9.3f}s  ({self.counts[name]} calls)"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        text = "\n".join(lines)
        logger.info("stage timings:\n%s", text)
        return text


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timer(fn, *args, iters: int = 5) -> float:
    """Median seconds per call of a jitted function; fences via host checksum."""
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda *a: jnp.sum(jnp.asarray(jax.tree.leaves(fn(*a))[0])))
    float(np.asarray(g(*args)))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(g(*args)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
