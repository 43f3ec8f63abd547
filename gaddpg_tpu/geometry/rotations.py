"""Batched SO(3) primitives (quaternions wxyz, sxyz euler, matrices).

Pure jnp; every function broadcasts over leading batch axes so the same
code path serves a single pose on host and a ``(num_envs, ...)`` batch
under ``vmap``/``pjit``. Numerical guards (eps, abs-clamps) are chosen so
gradients stay finite on TPU bfloat16/float32.
"""

import jax.numpy as jnp

_EPS = 1e-8


def quat_normalize(q):
    """Normalize quaternion(s) to unit length; zero-safe."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_mul(q1, q2):
    """Hamilton product q1*q2; both (..., 4) wxyz."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    """Conjugate (inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4).

    Uses the 2-cross-product form (same math as the reference's `qrot`,
    reference: core/utils.py:940-958) which is cheaper than building the
    matrix when rotating a single vector.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_mat(q):
    """Unit quaternion(s) (..., 4) -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free Shepperd's method: computes all four candidate columns
    and selects by the largest diagonal combination, so it is safe under
    vmap/jit (no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rot_x(a):
    """Rotation about x by angle a (..., ) -> (..., 3, 3)."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([o, z, z, z, c, -s, z, s, c], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([c, z, s, z, o, z, -s, z, c], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([c, -s, z, s, c, z, z, z, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def euler_to_mat(e):
    """sxyz euler (..., 3) -> matrix: R = Rz(ez) @ Ry(ey) @ Rx(ex).

    Matches transforms3d.euler.euler2mat default axes ('sxyz') used for
    action deltas in the reference (reference: env/panda_scene.py:761).
    """
    return rot_z(e[..., 2]) @ rot_y(e[..., 1]) @ rot_x(e[..., 0])


def mat_to_euler(m):
    """Matrix (..., 3, 3) -> sxyz euler (..., 3); gimbal-safe."""
    # R = Rz Ry Rx =>
    # m20 = -sin(ey); m21 = cos(ey) sin(ex); m22 = cos(ey) cos(ex)
    # m10 = cos(ey)... standard extraction:
    cy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    safe = cy > 1e-6
    ex = jnp.where(safe,
                   jnp.arctan2(m[..., 2, 1], m[..., 2, 2]),
                   jnp.arctan2(-m[..., 1, 2], m[..., 1, 1]))
    ey = jnp.arctan2(-m[..., 2, 0], cy)
    ez = jnp.where(safe, jnp.arctan2(m[..., 1, 0], m[..., 0, 0]), 0.0)
    return jnp.stack([ex, ey, ez], axis=-1)


def euler_to_quat(e):
    return mat_to_quat(euler_to_mat(e))


def axis_angle_to_quat(axis, angle):
    """Axis (..., 3, not necessarily unit) + angle (...,) -> quaternion."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_integrate(q, omega, dt):
    """Integrate unit quaternion by angular velocity omega (world frame).

    q_{t+1} = normalize(q + 0.5*dt * omega_quat * q). Stable for the small
    per-substep rotations of a 1 kHz physics loop.
    """
    omega_q = jnp.concatenate([jnp.zeros_like(omega[..., :1]), omega], axis=-1)
    dq = 0.5 * dt * quat_mul(omega_q, q)
    return quat_normalize(q + dq)
