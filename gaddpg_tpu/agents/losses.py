"""Point-matching (PM) losses over gripper control points.

Same math as the reference (reference: core/loss.py:17-31): transform
the 6 canonical control points by predicted and target poses, take the
L1 distance summed over xyz, averaged over points and (masked) batch.
Masks are handled with weighted means instead of boolean indexing so
shapes stay static under jit.
"""

import jax.numpy as jnp

from gaddpg_tpu.geometry.gripper import (
    transform_control_points_qt,
    control_points_from_euler_trans,
)


def _masked_mean(x, mask):
    """Mean of x (B, ...) over entries where mask (B,) is True; 0 if none."""
    if mask is None:
        return jnp.mean(x)
    w = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    # x reduced over all non-batch axes first
    per_item = x.reshape(x.shape[0], -1).mean(axis=-1)
    return jnp.sum(per_item * w) / denom


def goal_pred_loss(pred_qt, goal_qt, mask=None):
    """PM loss between 7-d [quat, trans] grasp predictions and targets.

    (reference: core/loss.py:17-23, rotz=True control points)
    """
    pred_pts = transform_control_points_qt(pred_qt, rotz=True)
    goal_pts = transform_control_points_qt(goal_qt, rotz=True)
    l1 = jnp.abs(pred_pts - goal_pts).sum(-1)  # (B, 6)
    return _masked_mean(l1, mask)


def pose_bc_loss(pi, expert_action, mask=None):
    """PM behavior-cloning loss between 6-d [trans, euler] actions.

    (reference: core/loss.py:25-31)
    """
    pred_pts = control_points_from_euler_trans(pi[..., 3:6], pi[..., :3])
    gt_pts = control_points_from_euler_trans(
        expert_action[..., 3:6], expert_action[..., :3]
    )
    l1 = jnp.abs(pred_pts - gt_pts).sum(-1)
    return _masked_mean(l1, mask)


def collision_bce(logit, target, mask=None, bound: float = 8.0):
    """Sigmoid binary cross-entropy for the collision-prediction logit
    against the collide_future flag (numerically stable log1p form).

    Two guards against the round-4 late-training collapse (success
    0.62 -> 0.17 after ~4.5k updates with collision-filtered demos,
    experiments/results/proc_policy.md):

    1. The logit is hard-clipped to [-bound, bound] (zero gradient past
       the clip). sigmoid(8) = 3e-4, so the clip costs nothing on real
       two-class data.
    2. The batch loss is GATED to zero when the batch carries no
       positive label. The clip alone proved insufficient (run
       bc_proc_r4e: identical collapse at ~4.5k updates WITH the clip):
       on an all-negative buffer the logit equilibrates just inside the
       bound, where the per-sample gradient is tiny (~3e-4) but
       CONSTANT-SIGN -- and Adam's normalized steps turn any constant-
       sign gradient into full-size drift through the SHARED encoder,
       degrading action features while bc_loss stays flat. A one-class
       aux task carries no information, so its correct loss is 0; with
       real positives in the batch (clutter buffers collected with
       COL_DISCOUNT instead of COL_FILTER) the gate is a no-op.
    """
    logit = jnp.clip(logit, -bound, bound)
    loss = jnp.maximum(logit, 0.0) - logit * target + jnp.log1p(
        jnp.exp(-jnp.abs(logit))
    )
    tgt = target if mask is None else target * mask
    has_pos = (jnp.max(tgt) > 0.5).astype(loss.dtype)
    return has_pos * _masked_mean(loss, mask)


def smooth_l1(pred, target, mask=None, beta: float = 1.0):
    """Huber/smooth-L1 (torch F.smooth_l1_loss semantics, beta=1)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    return _masked_mean(loss, mask)
