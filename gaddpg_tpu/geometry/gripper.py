"""Panda gripper control points and point-matching (PM) transforms.

The loss geometry of GA-DDPG lives here: 6 canonical gripper "control
points" are transformed by predicted and ground-truth poses and compared
with an L1 point-matching loss. Numbers match the reference exactly
(reference: core/utils.py:38-40, 814-937).
"""

import jax.numpy as jnp

from gaddpg_tpu.geometry.rotations import quat_rotate, rot_z, euler_to_mat

# 6 anchor points on the hand in the *wrist camera-aligned* frame used by
# the environment's point-cloud state: columns are points (3, 6)
# (reference: core/utils.py:38-40).
HAND_FINGER_POINTS = jnp.array(
    [
        [0.0, 0.0, 0.0, -0.0, 0.0, -0.0],
        [0.0, 0.0, 0.053, -0.053, 0.053, -0.053],
        [0.0, 0.0, 0.075, 0.075, 0.105, 0.105],
    ]
)

# Canonical control points in the gripper frame, (6, 3)
# (reference: core/utils.py:819-824).
GRIPPER_CONTROL_POINTS = jnp.array(
    [
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [0.053, -0.0, 0.075],
        [-0.053, 0.0, 0.075],
        [0.053, -0.0, 0.105],
        [-0.053, 0.0, 0.105],
    ]
)


def control_points(rotz: bool = False):
    """(6, 3) control points, optionally right-multiplied by Rz(pi/2).

    `rotz=True` reproduces `get_control_point_tensor(..., rotz=True)`
    (reference: core/utils.py:826-827): p @ Rz(pi/2) maps (x, y, z) ->
    (y, -x, z), aligning with HAND_FINGER_POINTS.
    """
    pts = GRIPPER_CONTROL_POINTS
    if rotz:
        pts = pts @ rot_z(jnp.array(jnp.pi / 2))
    return pts


def transform_control_points_qt(qt, rotz: bool = False):
    """Transform control points by packed grasps [q(4 wxyz), t(3)].

    qt: (..., 7). Returns (..., 6, 3). Mirrors
    `transform_control_points(mode='qt')` (reference: core/utils.py:834-874).
    """
    pts = control_points(rotz)
    q = qt[..., None, :4]
    t = qt[..., None, 4:7]
    return quat_rotate(jnp.broadcast_to(q, q.shape[:-2] + pts.shape[:1] + (4,)),
                       jnp.broadcast_to(pts, q.shape[:-2] + pts.shape)) + t


def control_points_from_euler_trans(euler, trans, rotz: bool = False):
    """Control points from sxyz euler (..., 3) + translation (..., 3).

    Mirrors `control_points_from_rot_and_trans`
    (reference: core/utils.py:926-937): pts @ R^T + t.
    """
    rot = euler_to_mat(euler)
    pts = control_points(rotz)
    return pts @ jnp.swapaxes(rot, -1, -2) + trans[..., None, :]
