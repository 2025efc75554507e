"""Learning-rate / momentum schedules.

The reference interpolates BOTH the learning rate and Adam's beta1 piecewise-linearly
over milestone fractions of total training steps (utilities/learning_utils.py:17-52).
Here the same schedule is an optax-compatible pure function of the step count, fed to
`optax.inject_hyperparams(adam)` so both hyperparameters update on-device without
host callbacks.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def piecewise_linear_interp(milestone_steps: Sequence[float], values: Sequence[float]):
    """Returns schedule(step) -> value, equivalent to np.interp over milestones."""
    xs = jnp.asarray(milestone_steps, dtype=jnp.float32)
    ys = jnp.asarray(values, dtype=jnp.float32)

    def schedule(step):
        return jnp.interp(jnp.asarray(step, jnp.float32), xs, ys)

    return schedule


def make_lr_momentum_schedules(
    total_steps: int,
    milestones: Sequence[float] = (0.0, 0.1, 0.7, 1.0),
    lrs: Sequence[float] = (3e-4, 3e-4, 3e-4, 1e-4),
    moms: Sequence[float] = (0.9, 0.9, 0.9, 0.9),
):
    steps = [m * total_steps for m in milestones]
    return piecewise_linear_interp(steps, lrs), piecewise_linear_interp(steps, moms)
