"""SELD training losses (parity with reference models/interfaces.py:273-355).

reg_xyz: loss = w_sed * BCE(event logits) + w_doa * (MAE_x + MAE_y + MAE_z), where
each axis MAE is masked by SED activity and normalized by the number of active
(frame, class) cells. accdoa: masked MSE on the DOA vector + a silent-region norm
penalty (the reference zeroes the sed term when totaling — mirrored here).
"""
from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    row_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean binary cross entropy with logits (torch F.binary_cross_entropy_with_logits).
    With row_weights (leading-dim weights, e.g. a 0/1 validity mask over padded
    batch rows), the mean runs over weighted rows only."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    if row_weights is None:
        return jnp.mean(loss)
    w = row_weights.reshape((-1,) + (1,) * (loss.ndim - 1))
    per_row = loss.size // loss.shape[0]
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(row_weights) * per_row, 1e-8)


def masked_reg_loss(pred, target, mask, loss_type: str = "MAE"):
    """Masked mean regression loss normalized by the mask mass."""
    n = min(pred.shape[1], target.shape[1])
    pred, target, mask = pred[:, :n], target[:, :n], mask[:, :n]
    denom = jnp.maximum(jnp.sum(mask), 1e-8)
    if loss_type == "MAE":
        return jnp.sum(jnp.abs(pred - target) * mask) / denom
    if loss_type == "MSE":
        return jnp.sum((pred - target) ** 2 * mask) / denom
    raise ValueError(f"unknown reg loss '{loss_type}'")


def seld_loss(pred: dict, target: dict, n_classes: int, loss_weight=(0.3, 0.7)):
    """reg_xyz loss. Returns (total, sed_loss, doa_loss)."""
    sed_l = bce_with_logits(pred["event_frame_logit"], target["event_frame_gt"])
    doa_pred = pred["doa_frame_output"]
    doa_gt = target["doa_frame_gt"]
    mask = target["event_frame_gt"]
    doa_l = sum(
        masked_reg_loss(
            doa_pred[:, :, i * n_classes : (i + 1) * n_classes],
            doa_gt[:, :, i * n_classes : (i + 1) * n_classes],
            mask,
        )
        for i in range(3)
    )
    total = loss_weight[0] * sed_l + loss_weight[1] * doa_l
    return total, sed_l, doa_l


def accdoa_mse(doa_pred, doa_gt, sed_mask, n_classes: int, n_cells):
    """Masked xyz MSE shared by the accdoa training and validation losses:
    sum over active (frame, class) cells of |pred-gt|^2, normalized by n_cells."""
    sq = (doa_pred - doa_gt) ** 2
    xyz = (sq[..., :n_classes] + sq[..., n_classes : 2 * n_classes]
           + sq[..., 2 * n_classes :])
    return jnp.sum(xyz * sed_mask) / jnp.maximum(n_cells, 1)


def accdoa_loss(pred: dict, target: dict, n_classes: int,
                silent_weight: float = 0.0):
    """ACCDOA loss variant (reference interfaces.py:284-302).
    Returns (total, sed_loss, doa_loss).

    The reference computes a silent-region penalty (pushing inactive classes'
    vector norms toward zero, its compute_classwise_accdoa_loss) but then zeroes
    it before summing (interfaces.py:279-280) — so its effective recipe never
    constrains inactive cells and over-triggers at eval (the SED decision is the
    vector norm). silent_weight=0 reproduces that exactly; silent_weight>0
    enables the reference's own (computed-but-discarded) penalty, same formula.
    """
    sed_gt = target["event_frame_gt"]
    n_cells = sed_gt.shape[0] * sed_gt.shape[1]
    doa_pred, doa_gt = pred["doa_frame_output"], target["doa_frame_gt"]
    doa_l = accdoa_mse(doa_pred, doa_gt, sed_gt, n_classes, n_cells)
    if silent_weight > 0.0:
        sq = (doa_pred - doa_gt) ** 2
        x = sq[..., :n_classes]
        y = sq[..., n_classes : 2 * n_classes]
        z = sq[..., 2 * n_classes :]
        # reference formula verbatim: "sed" = sqrt of the squared per-axis MSEs
        sed_hat = jnp.sqrt(x**2 + y**2 + z**2 + 1e-12)
        sed_l = jnp.sum((sed_hat - sed_gt) ** 2 * (1.0 - sed_gt)) / n_cells
    else:
        sed_l = jnp.zeros_like(doa_l)
    total = doa_l + silent_weight * sed_l
    return total, sed_l, doa_l
