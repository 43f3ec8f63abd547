"""Batched SE(3) helpers: 4x4 transforms and 7-d packed poses.

Mirrors the semantics of the reference's pose plumbing
(reference: core/utils.py:586-727) with jnp broadcasting over leading axes.
"""

import jax.numpy as jnp

from gaddpg_tpu.geometry.rotations import (
    euler_to_mat,
    mat_to_quat,
    quat_to_mat,
)


def se3_from_quat_pos(q, t):
    """(..., 4) quat wxyz + (..., 3) pos -> (..., 4, 4)."""
    rot = quat_to_mat(q)
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T):
    """Inverse of rigid transform(s) (..., 4, 4)."""
    rot = T[..., :3, :3]
    t = T[..., :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    top = jnp.concatenate([rot_t, -rot_t @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_mul(a, b):
    return a @ b


def se3_transform_points(T, pts):
    """Apply (..., 4, 4) to points (..., N, 3)."""
    return pts @ jnp.swapaxes(T[..., :3, :3], -1, -2) + T[..., None, :3, 3]


def pack_pose(T):
    """(..., 4, 4) -> [t(3), q(4)] (reference: core/utils.py:606-614)."""
    return jnp.concatenate([T[..., :3, 3], mat_to_quat(T[..., :3, :3])], axis=-1)


def unpack_pose(p):
    """[t(3), q(4)] -> (..., 4, 4)."""
    return se3_from_quat_pos(p[..., 3:7], p[..., :3])


def pack_pose_rot_first(T):
    """(..., 4, 4) -> [q(4), t(3)] (reference: core/utils.py:672-676)."""
    return jnp.concatenate([mat_to_quat(T[..., :3, :3]), T[..., :3, 3]], axis=-1)


def unpack_pose_rot_first(p):
    return se3_from_quat_pos(p[..., :4], p[..., 4:7])


def inv_relative_pose(pose_b2a, pose_c2a):
    """T_{b->c} = inv(T_{c->a}) @ T_{b->a}, on packed [t, q] poses.

    Same contract as the reference (reference: core/utils.py:712-727).
    """
    return se3_inverse(unpack_pose(pose_c2a)) @ unpack_pose(pose_b2a)


def unpack_action(action):
    """6-d task-space action [dx dy dz ex ey ez] -> (..., 4, 4) delta pose.

    (reference: core/utils.py:586-590)
    """
    rot = euler_to_mat(action[..., 3:6])
    top = jnp.concatenate([rot, action[..., :3, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=action.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log_pose_delta(T):
    """Approximate 6-d [t, euler-sxyz] coordinates of a delta transform.

    Inverse of `unpack_action` for small rotations; used to convert
    expert joint plans to task-space actions
    (reference: env/panda_scene.py:1118-1139).
    """
    from gaddpg_tpu.geometry.rotations import mat_to_euler

    return jnp.concatenate([T[..., :3, 3], mat_to_euler(T[..., :3, :3])], axis=-1)
