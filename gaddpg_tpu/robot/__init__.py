"""Analytic Panda kinematics: FK, Jacobians, batched DLS inverse kinematics.

Replaces the reference's PyBullet IK + PyKDL FK native dependencies
(reference: env/panda_scene.py:769,1129-1135; robot_pykdl) with pure-JAX
closed-form chains that vmap over thousands of envs.
"""

from gaddpg_tpu.robot.panda import (
    PandaKinematics,
    JOINT_LOWER,
    JOINT_UPPER,
    DEFAULT_JOINTS,
    ANCHOR_SEEDS,
    fk_hand,
    fk_all,
    fk_camera,
    fk_fingers,
)
from gaddpg_tpu.robot.ik import dls_ik, ik_from_seeds
