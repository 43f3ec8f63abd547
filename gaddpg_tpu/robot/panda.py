"""Closed-form Franka Panda forward kinematics in JAX.

Kinematic parameters transcribed from the reference's URDF
(reference: env/models/panda/panda_gripper_hand_camera.urdf):

    joint1: t=(0,0,0.333)            Rz(q1)
    joint2: rpy=(-pi/2,0,0)          Rz(q2)
    joint3: t=(0,-0.316,0)  rpy=(pi/2,0,0)   Rz(q3)
    joint4: t=(0.0825,0,0)  rpy=(pi/2,0,0)   Rz(q4)
    joint5: t=(-0.0825,0.384,0) rpy=(-pi/2,0,0) Rz(q5)
    joint6: rpy=(pi/2,0,0)           Rz(q6)
    joint7: t=(0.088,0,0)   rpy=(pi/2,0,0)   Rz(q7)
    hand:   t=(0,0,0.107)   Rz(-pi/4)                (fixed)
    fingerL/R: t=(0,0,0.0584), prismatic +-y          (0..0.04)
    camera: t=(0.036,0,0.036) rpy=(-pi/2,0,-pi/2)     (fixed)

The "end-effector" frame everywhere in this codebase is the *hand*
frame, matching PyBullet link index 7 used by the reference
(reference: env/panda_gripper_hand_camera.py:52).
"""

from functools import partial

import jax
import jax.numpy as jnp

# Arm joint limits (reference: env/panda_gripper_hand_camera.py:53-54).
JOINT_LOWER = jnp.array([-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973])
JOINT_UPPER = jnp.array([2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973])
FINGER_LOWER, FINGER_UPPER = 0.0, 0.04

# Home configuration (reference: env/panda_gripper_hand_camera.py:73-74).
DEFAULT_JOINTS = jnp.array([0.0, -1.285, 0.0, -2.356, 0.0, 1.571, 0.785])

# IK restart seeds (reference: core/utils.py:41-56).
ANCHOR_SEEDS = jnp.array(
    [
        [0.0, -1.285, 0, -2.356, 0.0, 1.571, 0.785],
        [2.5, 0.23, -2.89, -1.69, 0.056, 1.46, -1.27],
        [2.8, 0.23, -2.89, -1.69, 0.056, 1.46, -1.27],
        [2, 0.23, -2.89, -1.69, 0.056, 1.46, -1.27],
        [2.5, 0.83, -2.89, -1.69, 0.056, 1.46, -1.27],
        [0.049, 1.22, -1.87, -0.67, 2.12, 0.99, -0.85],
        [-2.28, -0.43, 2.47, -1.35, 0.62, 2.28, -0.27],
        [-2.02, -1.29, 2.20, -0.83, 0.22, 1.18, 0.74],
        [-2.2, 0.03, -2.89, -1.69, 0.056, 1.46, -1.27],
        [-2.5, -0.71, -2.73, -0.82, -0.7, 0.62, -0.56],
        [-2, -0.71, -2.73, -0.82, -0.7, 0.62, -0.56],
        [-2.66, -0.55, 2.06, -1.77, 0.96, 1.77, -1.35],
        [1.51, -1.48, -1.12, -1.55, -1.57, 1.15, 0.24],
        [-2.61, -0.98, 2.26, -0.85, 0.61, 1.64, 0.23],
    ]
)


def _rpy_t(roll, pitch, yaw, x, y, z):
    """Constant URDF joint-origin transform as a 4x4 (host-side)."""
    import numpy as np

    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    T = np.eye(4)
    T[:3, :3] = rz @ ry @ rx
    T[:3, 3] = [x, y, z]
    return T


import numpy as _np

_HPI = _np.pi / 2
# Static joint-origin transforms for the 7 revolute joints.
_ORIGINS = _np.stack(
    [
        _rpy_t(0, 0, 0, 0, 0, 0.333),
        _rpy_t(-_HPI, 0, 0, 0, 0, 0),
        _rpy_t(_HPI, 0, 0, 0, -0.316, 0),
        _rpy_t(_HPI, 0, 0, 0.0825, 0, 0),
        _rpy_t(-_HPI, 0, 0, -0.0825, 0.384, 0),
        _rpy_t(_HPI, 0, 0, 0, 0, 0),
        _rpy_t(_HPI, 0, 0, 0.088, 0, 0),
    ]
)
_T_HAND = _rpy_t(0, 0, -_np.pi / 4, 0, 0, 0.107)
_T_FINGER = _rpy_t(0, 0, 0, 0, 0, 0.0584)
_T_CAMERA = _rpy_t(-_HPI, 0, -_HPI, 0.036, 0, 0.036)

ORIGINS = jnp.asarray(_ORIGINS)
T_HAND = jnp.asarray(_T_HAND)
T_FINGER = jnp.asarray(_T_FINGER)
T_CAMERA = jnp.asarray(_T_CAMERA)


def _rz_h(q):
    """Rz(q) as 4x4 for a traced scalar."""
    c, s = jnp.cos(q), jnp.sin(q)
    z = jnp.zeros_like(q)
    o = jnp.ones_like(q)
    m = jnp.stack(
        [c, -s, z, z,
         s, c, z, z,
         z, z, o, z,
         z, z, z, o]
    )
    return m.reshape(4, 4)


def fk_all(q, base=None):
    """All 8 frames (links 1..7 + hand) for arm joints q (7,).

    Returns (8, 4, 4) in the base frame (or world if `base` 4x4 given).
    Uses a Python loop over the 7 fixed joints: unrolls into 7 small
    matmuls under jit, which XLA fuses -- no dynamic control flow.
    """
    T = jnp.eye(4) if base is None else base
    frames = []
    for i in range(7):
        T = T @ ORIGINS[i] @ _rz_h(q[i])
        frames.append(T)
    T = T @ T_HAND
    frames.append(T)
    return jnp.stack(frames)


# ---------------------------------------------------------------------------
# Full-arm collision skeleton: sphere proxies along the link capsules.
# The reference plans and collision-checks EVERY robot link -- OMG
# combines per-obstacle SDFs against all arm links
# (reference: env/panda_scene.py:897-917) and the env collision check
# queries each one (reference: env/panda_scene.py:1078-1095). Segment
# radii approximate the URDF link shells (upper arm ~0.065 m tapering
# to ~0.05 m at the wrist).
_ARM_SEG_RADII = _np.array([0.065, 0.065, 0.062, 0.058, 0.055, 0.05, 0.05])
# sample fractions along each inter-frame segment (frame origins double
# as segment ends, so t=0 covers the joint itself)
_ARM_SEG_TS = _np.array([0.0, 0.5])
ARM_POINT_RADII = jnp.asarray(
    _np.concatenate([_np.repeat(_ARM_SEG_RADII, len(_ARM_SEG_TS)), [0.05]])
)


def arm_collision_points(q=None, base=None, frames=None):
    """(N, 3) world sphere centers along the arm skeleton (pair with
    ARM_POINT_RADII (N,)).

    Spheres sit at each inter-frame segment's endpoints/midpoint from
    link1 through the hand -- the elbow and forearm sweep volume the
    wrist-local probes cannot see. Pass precomputed `frames` (from
    fk_all) to avoid a second FK chain.
    """
    if frames is None:
        frames = fk_all(q, base)
    starts = frames[:-1, :3, 3]                     # (7, 3)
    ends = frames[1:, :3, 3]
    ts = jnp.asarray(_ARM_SEG_TS)[None, :, None]
    pts = starts[:, None, :] * (1.0 - ts) + ends[:, None, :] * ts  # (7, T, 3)
    return jnp.concatenate([pts.reshape(-1, 3), ends[-1:]], axis=0)


def fk_hand(q, base=None):
    """Hand ("end-effector") frame only, (4, 4)."""
    T = jnp.eye(4) if base is None else base
    for i in range(7):
        T = T @ ORIGINS[i] @ _rz_h(q[i])
    return T @ T_HAND


def fk_camera(q, base=None):
    """Wrist camera frame (4, 4): hand @ T_CAMERA."""
    return fk_hand(q, base) @ T_CAMERA


def fk_fingers(q, finger, base=None):
    """Left/right fingertip frames given finger openings (2,).

    Finger 1 translates +y, finger 2 -y in the hand frame
    (reference URDF finger joint axes).
    Returns (2, 4, 4).
    """
    hand = fk_hand(q, base)
    tl = jnp.eye(4).at[1, 3].set(finger[0])
    tr = jnp.eye(4).at[1, 3].set(-finger[1])
    return jnp.stack([hand @ T_FINGER @ tl, hand @ T_FINGER @ tr])


@partial(jax.jit, static_argnames=())
def hand_jacobian(q):
    """6x7 geometric Jacobian of the hand frame (position, rotvec)."""

    def pos_rot(qq):
        T = fk_hand(qq)
        return T[:3, 3], T[:3, :3]

    # Position jacobian via jacfwd; rotation via frame axes.
    jp = jax.jacfwd(lambda qq: fk_hand(qq)[:3, 3])(q)  # (3, 7)
    # Rotation axes: z axis of each joint frame in base coords.
    T = jnp.eye(4)
    axes = []
    for i in range(7):
        T = T @ ORIGINS[i] @ _rz_h(q[i])
        axes.append(T[:3, 2])
    jr = jnp.stack(axes, axis=-1)  # (3, 7)
    return jnp.concatenate([jp, jr], axis=0)


class PandaKinematics:
    """Thin namespace bundling the chain constants for callers."""

    joint_lower = JOINT_LOWER
    joint_upper = JOINT_UPPER
    default_joints = DEFAULT_JOINTS
    anchor_seeds = ANCHOR_SEEDS
    fk_hand = staticmethod(fk_hand)
    fk_all = staticmethod(fk_all)
    fk_camera = staticmethod(fk_camera)
    fk_fingers = staticmethod(fk_fingers)
