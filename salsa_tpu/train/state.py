"""Train state: params + BN stats + optax Adam with on-device scheduled lr AND beta1
(the reference schedules both via a Lightning callback; here they are pure functions
of the optimizer step injected with optax.inject_hyperparams)."""
from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import core, struct

from salsa_tpu.train.schedules import make_lr_momentum_schedules


class TrainState(struct.PyTreeNode):
    step: int
    params: core.FrozenDict[str, Any] | dict
    batch_stats: core.FrozenDict[str, Any] | dict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(
    total_steps: int,
    optimizer_name: str = "adam",
    milestones=(0.0, 0.1, 0.7, 1.0),
    lrs=(3e-4, 3e-4, 3e-4, 1e-4),
    moms=(0.9, 0.9, 0.9, 0.9),
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    lr_sched, mom_sched = make_lr_momentum_schedules(total_steps, milestones, lrs, moms)
    name = optimizer_name.lower()
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr_sched, b1=mom_sched)
    if name == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_sched, b1=mom_sched, weight_decay=weight_decay
        )
    raise ValueError(f"unknown optimizer '{optimizer_name}'")


def dropout_rng(seed: int):
    """Dropout PRNG key. Uses the hardware RBG generator where available: threefry
    mask generation costs ~40% of a whole CRNN train step on TPU, rbg is ~10x
    cheaper and dropout needs no counter-based reproducibility guarantees across
    backends."""
    try:
        return jax.random.key(seed, impl="rbg")
    except Exception:  # pragma: no cover - older jax fallback
        return jax.random.PRNGKey(seed)


def create_train_state(model, sample_input, tx, seed: int = 0) -> TrainState:
    variables = model.init(jax.random.PRNGKey(seed), sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
