"""Grasp-goal selection from the object grasp database."""

import jax.numpy as jnp

from gaddpg_tpu.geometry.gripper import HAND_FINGER_POINTS
from gaddpg_tpu.geometry.se3 import se3_inverse


def reachable_grasp_mask(grasps_world, valid, min_up: float = -0.3):
    """Filter grasps approaching from below the table.

    Mirrors the hand-direction validity check
    (reference: core/utils.py:141-143): the approach axis (+z of the
    grasp frame) must not point upward too steeply (i.e. hand coming
    from underneath), so its world-z must stay above `min_up`... the
    actual constraint: approach z-component <= -min_up means the hand
    doesn't approach from below.
    """
    approach_z = grasps_world[..., 2, 2]  # world z of grasp +z axis
    return valid & (approach_z < 0.3)


def nearest_grasp_goal(hand_pose, obj_pose, grasps_obj, valid):
    """PM-nearest reachable grasp.

    hand_pose (4,4) world; obj_pose (4,4) world; grasps_obj (G,4,4) in
    object frame; valid (G,) database mask. Returns (goal_world (4,4),
    rel_pose (4,4) hand->goal, found bool). Distance metric = mean L1 of
    the 6 finger points, exactly the reference's argmin
    (reference: env/panda_scene.py:1258-1264).
    """
    grasps_w = obj_pose[None] @ grasps_obj  # (G, 4, 4)
    ok = reachable_grasp_mask(grasps_w, valid)

    rel = se3_inverse(hand_pose)[None] @ grasps_w  # (G, 4, 4)
    p1 = HAND_FINGER_POINTS  # (3, 6)
    p2 = rel[:, :3, :3] @ p1[None] + rel[:, :3, 3:]
    dist = jnp.abs(p1[None] - p2).sum(axis=1).mean(-1)  # (G,)
    dist = jnp.where(ok, dist, 1e9)
    best = jnp.argmin(dist)
    found = jnp.any(ok)
    return grasps_w[best], rel[best], found
