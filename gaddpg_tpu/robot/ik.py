"""Batched damped-least-squares inverse kinematics.

Replaces PyBullet's `calculateInverseKinematics`
(reference: env/panda_scene.py:769) and the PyKDL-seeded sampler
(reference: env/panda_scene.py:814-816). Fixed iteration count + masked
convergence keeps shapes static for XLA; `ik_from_seeds` vmaps the solve
over the 14 anchor seeds and picks the best converged branch.
"""

from functools import partial

import jax
import jax.numpy as jnp

from gaddpg_tpu.utils.precision import f32_matmuls
from gaddpg_tpu.robot.panda import (
    ANCHOR_SEEDS,
    JOINT_LOWER,
    JOINT_UPPER,
    fk_all,
    fk_hand,
)


def _rotvec_err(T_rot, target_rot):
    """Scaled rotation-vector error of hand rotation vs target."""
    r_err = target_rot @ T_rot.T
    w = jnp.stack(
        [
            r_err[2, 1] - r_err[1, 2],
            r_err[0, 2] - r_err[2, 0],
            r_err[1, 0] - r_err[0, 1],
        ]
    )
    cos_t = jnp.clip((jnp.trace(r_err) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)
    scale = jnp.where(sin_t > 1e-6, theta / (2.0 * jnp.maximum(sin_t, 1e-6)), 0.5)
    return scale * w


def _err_and_jacobian(q, target_pos, target_rot):
    """6-d task error + analytic geometric jacobian from ONE FK pass.

    Joint i rotates about the z-axis of its post-origin frame, so the
    world-frame geometric jacobian columns are [z_i x (p_e - p_i); z_i]
    straight from the fk_all intermediates -- no forward-mode dual FK
    (which re-runs the 14-matmul chain with 7 tangents and dominated
    the per-step cost: IK was ~44% of the profiled env step).
    The position rows equal -d(err)/dq exactly; the rotation rows are
    Jr^{-1}(r) @ Jw -- the SO(3) right-Jacobian-inverse transport of the
    geometric angular jacobian, which matches the forward-mode jacobian
    of the rotvec error to float precision at any error angle (verified
    to 1e-7 at theta = 1.24 rad against jax.jacfwd).
    """
    frames = fk_all(q)
    T = frames[-1]
    p_e = T[:3, 3]
    perr = target_pos - p_e
    rerr = _rotvec_err(T[:3, :3], target_rot)
    z = frames[:7, :3, 2]                      # (7, 3) joint axes
    p = frames[:7, :3, 3]                      # (7, 3) joint origins
    jv = jnp.cross(z, p_e[None, :] - p)        # (7, 3)
    # rotation-row transport: Jr^{-1}(r) = I + rx/2 + c(theta) rx^2
    r = rerr
    th = jnp.linalg.norm(r)
    rx = jnp.array([
        [0.0, -r[2], r[1]],
        [r[2], 0.0, -r[0]],
        [-r[1], r[0], 0.0],
    ])
    th_s = jnp.maximum(th, 1e-9)
    sin_t = jnp.sin(th_s)
    coef = jnp.where(
        (th > 1e-6) & (sin_t > 1e-6),
        1.0 / th_s**2 - (1.0 + jnp.cos(th_s)) / (2.0 * th_s * jnp.maximum(sin_t, 1e-9)),
        1.0 / 12.0,
    )
    jr_inv = jnp.eye(3) + 0.5 * rx + coef * (rx @ rx)
    J = jnp.concatenate([jv, z @ jr_inv.T], axis=1).T  # (6, 7)
    return jnp.concatenate([perr, rerr]), J


def _pose_error(q, target_pos, target_rot):
    """6-d task error of hand frame vs target (position, orientation)."""
    T = fk_hand(q)
    perr = target_pos - T[:3, 3]
    # Orientation error as rotation vector of R_err = R_tgt R_cur^T.
    r_err = target_rot @ T[:3, :3].T
    # rotvec via skew part (accurate for the small errors DLS converges through)
    w = jnp.stack(
        [
            r_err[2, 1] - r_err[1, 2],
            r_err[0, 2] - r_err[2, 0],
            r_err[1, 0] - r_err[0, 1],
        ]
    )
    cos_t = jnp.clip((jnp.trace(r_err) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)
    scale = jnp.where(sin_t > 1e-6, theta / (2.0 * jnp.maximum(sin_t, 1e-6)), 0.5)
    return jnp.concatenate([perr, scale * w])


@partial(jax.jit, static_argnames=("iters", "pos_only"))
@f32_matmuls
def dls_ik(
    seed_q,
    target_pos,
    target_rot,
    iters: int = 30,
    damping: float = 0.05,
    pos_only: bool = False,
):
    """Damped-least-squares IK from one seed.

    Returns (q, pos_err, rot_err). All shapes static; runs as a
    `lax.fori_loop` of (6x7) linear solves -- trivially vmappable.
    """

    def body(_, q):
        e, J = _err_and_jacobian(q, target_pos, target_rot)
        if pos_only:
            e = e.at[3:].set(0.0)
            J = J.at[3:].set(0.0)
        A = J @ J.T + (damping**2) * jnp.eye(6)
        dq = J.T @ jnp.linalg.solve(A, e)
        q = jnp.clip(q + dq, JOINT_LOWER, JOINT_UPPER)
        return q

    q = jax.lax.fori_loop(0, iters, body, seed_q)
    e = _pose_error(q, target_pos, target_rot)
    if pos_only:
        e = e.at[3:].set(0.0)
    return q, jnp.linalg.norm(e[:3]), jnp.linalg.norm(e[3:])


@partial(jax.jit, static_argnames=("iters", "pos_only"))
@f32_matmuls
def ik_from_seeds(
    target_pos,
    target_rot,
    seeds=ANCHOR_SEEDS,
    iters: int = 30,
    pos_tol: float = 5e-3,
    rot_tol: float = 5e-2,
    pos_only: bool = False,
):
    """Multi-start IK over anchor seeds; returns (q, success).

    Mirrors the reference's seeded-restart strategy
    (reference: env/panda_scene.py:809-818) but evaluates every seed in
    parallel and argmin-selects, instead of sequential trial loops.
    """
    qs, perr, rerr = jax.vmap(
        lambda s: dls_ik(s, target_pos, target_rot, iters=iters, pos_only=pos_only)
    )(seeds)
    score = perr + rerr
    best = jnp.argmin(score)
    ok = (perr[best] < pos_tol) & ((rerr[best] < rot_tol) | pos_only)
    return qs[best], ok
