"""SE(3) / SO(3) math used across the framework.

All functions are pure jnp, operate on trailing axes, and are safe under
`vmap`/`jit`. Conventions (kept compatible with the reference's
transforms3d usage, reference: core/utils.py:586-727):

- quaternions are ``(w, x, y, z)``
- euler angles are static-frame xyz ("sxyz"): ``R = Rz(ez) @ Ry(ey) @ Rx(ex)``
- a packed pose is ``[t(3), q(4)]``; "rot-first" packing is ``[q(4), t(3)]``
"""

from gaddpg_tpu.geometry.rotations import (
    quat_mul,
    quat_conj,
    quat_rotate,
    quat_to_mat,
    mat_to_quat,
    euler_to_mat,
    mat_to_euler,
    euler_to_quat,
    quat_normalize,
    axis_angle_to_quat,
    quat_integrate,
    rot_x,
    rot_y,
    rot_z,
)
from gaddpg_tpu.geometry.se3 import (
    se3_from_quat_pos,
    se3_inverse,
    se3_mul,
    se3_transform_points,
    pack_pose,
    unpack_pose,
    pack_pose_rot_first,
    unpack_pose_rot_first,
    inv_relative_pose,
    unpack_action,
    se3_log_pose_delta,
)
from gaddpg_tpu.geometry.gripper import (
    HAND_FINGER_POINTS,
    GRIPPER_CONTROL_POINTS,
    control_points,
    transform_control_points_qt,
    control_points_from_euler_trans,
)
