"""Goal-servo expert: standoff approach then final insertion.

Produces clipped task-space actions toward the grasp goal, following
the OMG planner's standoff structure (standoff_dist = 0.08,
reference: experiments/config.py:220, env/panda_scene.py:198). In
single-object scenes a collision-free straight servo reproduces the
expert's role for BC/DAgger; cluttered scenes will swap in the batched
trajectory optimizer.
"""

import jax.numpy as jnp

from gaddpg_tpu.geometry.rotations import mat_to_euler
from gaddpg_tpu.geometry.se3 import se3_inverse
from gaddpg_tpu.models.heads import TASK6D_HIGH

STANDOFF_DIST = 0.08


def expert_plan_length(rel_goal, max_step: int = 20):
    """Rough step count the servo needs -- the remaining-time feature
    analogue of the expert trajectory length
    (reference: core/train_online.py:226-229)."""
    t_dist = jnp.linalg.norm(rel_goal[:3, 3])
    steps = jnp.ceil(t_dist / 0.04) + 4.0
    return jnp.clip(steps, 6.0, float(max_step))


def expert_action(hand_pose, goal_pose, step_frac=None):
    """6-d [dt(3), euler(3)] action in the hand frame toward the goal.

    Moves to a standoff pose `STANDOFF_DIST` behind the grasp along its
    approach (+z) axis first; once within tolerance, drives straight in.
    Action is clipped to the PandaTaskSpace6D box like every env action.
    """
    standoff = goal_pose.at[:3, 3].add(-STANDOFF_DIST * goal_pose[:3, 2])
    rel_final = se3_inverse(hand_pose) @ goal_pose
    rel_stand = se3_inverse(hand_pose) @ standoff

    # Hand position in the goal frame: on the insertion corridor the hand
    # sits at (0, 0, -d), d in [0, STANDOFF]. Using the corridor (not a
    # point test) gives hysteresis-free switching between the standoff
    # and insertion phases.
    g = se3_inverse(goal_pose) @ hand_pose
    lateral = jnp.linalg.norm(g[:2, 3])
    along = g[2, 3]
    aligned = jnp.trace(rel_final[:3, :3]) > 2.9
    on_corridor = (
        (lateral < 0.02)
        & (along > -STANDOFF_DIST - 0.03)
        & (along < 0.01)
        & aligned
    )
    rel = jnp.where(on_corridor, rel_final, rel_stand)

    delta_t = rel[:3, 3]
    delta_e = mat_to_euler(rel[:3, :3])
    action = jnp.concatenate([delta_t, delta_e])
    high = jnp.asarray(TASK6D_HIGH)
    return jnp.clip(action, -high, high)
