"""Batched damped-least-squares inverse kinematics.

Replaces PyBullet's `calculateInverseKinematics`
(reference: env/panda_scene.py:769) and the PyKDL-seeded sampler
(reference: env/panda_scene.py:814-816). Fixed iteration count + masked
convergence keeps shapes static for XLA; `ik_from_seeds` vmaps the solve
over the 14 anchor seeds and picks the best converged branch.

Round-5 rebuild of the iteration body: ZERO matmul-class ops and no
`linalg.solve`. On the target device per-HLO-op dispatch dominates and
`dot_general`/LU custom calls block fusion -- the round-4 analytic-
Jacobian loop compiled to a 190-op while body (10 trips = 57% of the
whole env step's executed ops). This version carries the FK chain as
quaternions (geometry/rotations component math, the same trick as
physics/fast.py), forms the rotation-error vector and trace via the
column identities

    w = sum_k R[:,k] x T[:,k],     trace(T R^T) = sum(T * R)

the right-Jacobian-inverse action via rx^2 = r r^T - |r|^2 I (outer
product, no matrix product), the normal equations A = J J^T as an
elementwise broadcast-reduce, and solves the 6x6 SPD system with an
unrolled Cholesky in scalar ops. Every op is elementwise or a tiny
reduce, so XLA fuses the whole iteration into a handful of kernels.
Numerics match the previous matmul formulation to float tolerance
(tests/test_robot.py pins pose error after the solve).
"""

from functools import partial

import jax
import jax.numpy as jnp

from gaddpg_tpu.geometry.rotations import quat_mul, quat_rotate, quat_to_mat
from gaddpg_tpu.robot.panda import (
    ANCHOR_SEEDS,
    JOINT_LOWER,
    JOINT_UPPER,
)


def _fk_chain_q():
    """Constant joint-origin chain as quaternions (host-side, cached)."""
    import numpy as np
    from scipy.spatial.transform import Rotation as R

    from gaddpg_tpu.robot.panda import _ORIGINS, _T_HAND

    oq = np.roll(R.from_matrix(_ORIGINS[:, :3, :3]).as_quat(), 1, axis=-1)
    hq = np.roll(R.from_matrix(_T_HAND[:3, :3]).as_quat(), 1, axis=-1)
    return (jnp.asarray(oq, jnp.float32), jnp.asarray(_ORIGINS[:, :3, 3], jnp.float32),
            jnp.asarray(hq, jnp.float32), jnp.asarray(_T_HAND[:3, 3], jnp.float32))


_OQ, _OT, _HQ, _HT = _fk_chain_q()
_EZ = jnp.array([0.0, 0.0, 1.0])


def _fk_frames_fused(q):
    """Hand pose + per-joint axes/origins from one quaternion FK pass.

    Returns (p_e (3,), R_hand (3,3), z (7,3) joint axes, p (7,3) joint
    origins). Matches panda.fk_all's frames[-1] and frames[:7,:3,{2,3}]
    to float tolerance, with only elementwise quaternion component math.
    """
    pos = jnp.zeros(3, q.dtype)
    rot = jnp.array([1.0, 0.0, 0.0, 0.0], q.dtype)
    zs, ps = [], []
    for i in range(7):
        pos = pos + quat_rotate(rot, _OT[i])
        rot = quat_mul(rot, _OQ[i])
        zs.append(quat_rotate(rot, _EZ))   # Rz(q_i) keeps the z axis
        ps.append(pos)                      # ...and the origin
        half = q[i] * 0.5
        zq = jnp.stack([jnp.cos(half), jnp.zeros_like(half),
                        jnp.zeros_like(half), jnp.sin(half)])
        rot = quat_mul(rot, zq)
    pos = pos + quat_rotate(rot, _HT)
    rot = quat_mul(rot, _HQ)
    return pos, quat_to_mat(rot), jnp.stack(zs), jnp.stack(ps)


def _rot_err_vec(R_hand, target_rot):
    """Scaled rotation-vector error of hand rotation vs target.

    rotvec of R_err = T R^T via the column identities (no 3x3 product):
    skew part w = sum_k R[:,k] x T[:,k]; trace(T R^T) = sum(T * R).
    """
    w = jnp.cross(R_hand.T, target_rot.T).sum(axis=0)
    cos_t = jnp.clip((jnp.sum(target_rot * R_hand) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)
    scale = jnp.where(sin_t > 1e-6, theta / (2.0 * jnp.maximum(sin_t, 1e-6)), 0.5)
    return scale * w


def _err_and_jacobian(q, target_pos, target_rot):
    """6-d task error + analytic geometric jacobian from ONE FK pass.

    Joint i rotates about the z-axis of its post-origin frame, so the
    world-frame geometric jacobian columns are [z_i x (p_e - p_i); z_i]
    straight from the FK intermediates. The position rows equal
    -d(err)/dq exactly; the rotation rows are Jr^{-1}(r) @ Jw -- the
    SO(3) right-Jacobian-inverse transport of the geometric angular
    jacobian, applied per column as

        Jr^{-1} z = z + (r x z)/2 + c(theta) (r (r.z) - theta^2 z)

    (rx^2 = r r^T - |r|^2 I), which matches the forward-mode jacobian
    of the rotvec error to float precision at any error angle (verified
    to 1e-7 at theta = 1.24 rad against jax.jacfwd).
    """
    p_e, R_hand, z, p = _fk_frames_fused(q)
    perr = target_pos - p_e
    rerr = _rot_err_vec(R_hand, target_rot)
    jv = jnp.cross(z, p_e[None, :] - p)        # (7, 3)
    r = rerr
    th2 = jnp.sum(r * r)
    th = jnp.sqrt(th2)
    th_s = jnp.maximum(th, 1e-9)
    sin_t = jnp.sin(th_s)
    coef = jnp.where(
        (th > 1e-6) & (sin_t > 1e-6),
        1.0 / jnp.maximum(th2, 1e-18)
        - (1.0 + jnp.cos(th_s)) / (2.0 * th_s * jnp.maximum(sin_t, 1e-9)),
        1.0 / 12.0,
    )
    # per-column right-Jacobian-inverse action (elementwise):
    jw = (z + 0.5 * jnp.cross(r[None, :], z)
          + coef * (r[None, :] * jnp.sum(z * r[None, :], axis=1, keepdims=True)
                    - th2 * z))                # (7, 3)
    J = jnp.concatenate([jv, jw], axis=1).T    # (6, 7)
    return jnp.concatenate([perr, rerr]), J


def _chol_solve6(A, b):
    """Unrolled 6x6 SPD Cholesky solve in scalar ops (fusible: no LU
    custom call, no triangular-solve HLO). A = J J^T + damping^2 I keeps
    the diagonal bounded away from zero."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _pose_error(q, target_pos, target_rot):
    """6-d task error of hand frame vs target (position, orientation)."""
    p_e, R_hand, _, _ = _fk_frames_fused(q)
    perr = target_pos - p_e
    return jnp.concatenate([perr, _rot_err_vec(R_hand, target_rot)])


@partial(jax.jit, static_argnames=("iters", "pos_only"))
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
    `lax.fori_loop` of fully-fused elementwise iterations -- trivially
    vmappable.
    """

    def body(_, q):
        e, J = _err_and_jacobian(q, target_pos, target_rot)
        if pos_only:
            e = e.at[3:].set(0.0)
            J = J.at[3:].set(0.0)
        A = ((J[:, None, :] * J[None, :, :]).sum(-1)
             + (damping**2) * jnp.eye(6))
        x = _chol_solve6(A, e)
        dq = (J * x[:, None]).sum(0)
        q = jnp.clip(q + dq, JOINT_LOWER, JOINT_UPPER)
        return q

    q = jax.lax.fori_loop(0, iters, body, seed_q)
    e = _pose_error(q, target_pos, target_rot)
    if pos_only:
        e = e.at[3:].set(0.0)
    return q, jnp.linalg.norm(e[:3]), jnp.linalg.norm(e[3:])


@partial(jax.jit, static_argnames=("iters", "pos_only"))
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
