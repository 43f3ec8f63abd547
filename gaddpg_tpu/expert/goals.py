"""Grasp-goal selection from the object grasp database."""

import jax.numpy as jnp

from gaddpg_tpu.geometry.gripper import HAND_FINGER_POINTS
from gaddpg_tpu.geometry.se3 import se3_inverse


def reachable_grasp_mask(grasps_world, valid, max_up: float = 0.3):
    """Filter grasps approaching from below the table.

    Mirrors the hand-direction validity check
    (reference: core/utils.py:141-143): the approach axis (+z of the
    grasp frame) points from the palm toward the object, so a large
    positive world-z component means the hand comes from underneath the
    table. Grasps with approach-axis world-z >= `max_up` are rejected.
    """
    approach_z = grasps_world[..., 2, 2]  # world z of grasp +z axis
    return valid & (approach_z < max_up)


def clutter_clear_mask(grasps_world, clutter_spheres, clearance: float = 0.03):
    """Reject grasps whose gripper would land inside the clutter.

    Probes the palm center and the standoff approach point of each grasp
    against the clutter sphere set ((M, 4) world, radius 0 = padding) --
    the OMG expert implicitly does this by planning against the combined
    obstacle SDF (reference: env/panda_scene.py:897-917).
    """
    if clutter_spheres.shape[0] == 0:
        return jnp.ones(grasps_world.shape[:-2], bool)
    palm = grasps_world[..., :3, 3]
    stand = palm - 0.08 * grasps_world[..., :3, 2]
    tip = palm + 0.04 * grasps_world[..., :3, 2]
    ok = jnp.ones(grasps_world.shape[:-2], bool)
    for p in (palm, stand, tip):
        d = jnp.linalg.norm(
            p[..., None, :] - clutter_spheres[None, :, :3], axis=-1
        ) - clutter_spheres[None, :, 3]
        d = jnp.where(clutter_spheres[None, :, 3] > 0, d, jnp.inf)
        ok = ok & (jnp.min(d, axis=-1) > clearance)
    return ok


def nearest_grasp_goal(hand_pose, obj_pose, grasps_obj, valid,
                       clutter_spheres=None):
    """PM-nearest reachable grasp.

    hand_pose (4,4) world; obj_pose (4,4) world; grasps_obj (G,4,4) in
    object frame; valid (G,) database mask. Returns (goal_world (4,4),
    rel_pose (4,4) hand->goal, found bool). Distance metric = mean L1 of
    the 6 finger points, exactly the reference's argmin
    (reference: env/panda_scene.py:1258-1264). `clutter_spheres`
    optionally rejects goals buried in clutter.
    """
    grasps_w = obj_pose[None] @ grasps_obj  # (G, 4, 4)
    ok = reachable_grasp_mask(grasps_w, valid)
    if clutter_spheres is not None and clutter_spheres.shape[0] > 0:
        ok = ok & clutter_clear_mask(grasps_w, clutter_spheres)

    rel = se3_inverse(hand_pose)[None] @ grasps_w  # (G, 4, 4)
    p1 = HAND_FINGER_POINTS  # (3, 6)
    p2 = rel[:, :3, :3] @ p1[None] + rel[:, :3, 3:]
    dist = jnp.abs(p1[None] - p2).sum(axis=1).mean(-1)  # (G,)
    dist = jnp.where(ok, dist, 1e9)
    best = jnp.argmin(dist)
    found = jnp.any(ok)
    return grasps_w[best], rel[best], found
