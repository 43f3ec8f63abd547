"""Batched CHOMP-style trajectory-optimizer expert.

TPU-native replacement for the OMG `PlanningScene` expert
(reference: env/panda_scene.py:881-993): joint-space waypoints optimized
by fixed-iteration gradient descent on a smoothness + obstacle cost over
the clutter sphere sets (the same sphere approximations the contact
solver uses -- an SDF proxy, reference: setup_expert_scene combines
per-obstacle SDFs at :897-917), with the OMG expert's standoff/insertion
grasp structure (standoff_dist 0.08, reference: experiments/config.py:220)
and joint-limit projection.

Everything is static-shape and jit/vmap-friendly: `lax.scan` over a
fixed number of descent iterations, fixed waypoint count, obstacle set
padded to (NOBS, 4) with radius 0 padding. One `plan_to_goal` call per
episode (and per DAgger replan) runs across the whole env batch.
"""

from functools import partial

import jax
import jax.numpy as jnp

from gaddpg_tpu.geometry.rotations import mat_to_euler
from gaddpg_tpu.geometry.se3 import se3_inverse
from gaddpg_tpu.models.heads import TASK6D_HIGH
from gaddpg_tpu.robot.ik import dls_ik
from gaddpg_tpu.robot.panda import (
    ARM_POINT_RADII, JOINT_LOWER, JOINT_UPPER, arm_collision_points,
    fk_all, fk_hand,
)
from gaddpg_tpu.utils.precision import f32_matmuls

STANDOFF_DIST = 0.08     # reference: experiments/config.py:220
APPROACH_STEPS = 16      # optimized waypoints to the standoff pose
INSERT_STEPS = 4         # straight standoff -> grasp insertion
PLAN_STEPS = APPROACH_STEPS + INSERT_STEPS

# gripper-local probe points for the obstacle cost: wrist, palm sides,
# finger spread, fingertip center, tip overshoot (hand frame). The
# full-arm capsule skeleton (robot/panda.arm_collision_points) joins
# these so forearm/elbow sweeps through clutter are costed too, like
# OMG's all-link SDF cost (reference: env/panda_scene.py:897-917).
_PROBES = jnp.array(
    [
        [0.0, 0.0, 0.0],
        [0.0, 0.055, 0.03],
        [0.0, -0.055, 0.03],
        [0.0, 0.045, 0.085],
        [0.0, -0.045, 0.085],
        [0.0, 0.0, 0.065],
        [0.0, 0.0, 0.112],
    ]
)
PROBE_RADIUS = 0.022     # effective thickness of the probed geometry


def _smoothness_preconditioner():
    """Inverse CHOMP metric M^-1, M = A^T A with A the second-difference
    operator over the trajectory restricted to the free waypoints.

    Preconditioning the descent with M^-1 is what makes CHOMP converge
    in tens of iterations: plain gradient steps on the smoothness
    objective are ill-conditioned (curvature ~||A||^2) and either crawl
    or explode; M^-1 also propagates local obstacle gradients along the
    whole trajectory. Constant for fixed APPROACH_STEPS -> precomputed.
    """
    import numpy as np

    T = APPROACH_STEPS
    m = T - 2
    A = np.zeros((T - 2, T))
    for t in range(T - 2):
        A[t, t] = 1.0
        A[t, t + 1] = -2.0
        A[t, t + 2] = 1.0
    A_free = A[:, 1:-1]  # columns of the free waypoints
    M = A_free.T @ A_free + 1e-6 * np.eye(m)
    return jnp.asarray(np.linalg.inv(M))


_MINV = _smoothness_preconditioner()


def _probe_world(q):
    """(P, 3) world positions + (P,) radii of all collision probes at
    arm joints q (7,): gripper probes + the full-arm capsule skeleton
    (ONE FK chain via fk_all)."""
    frames = fk_all(q)
    hand = frames[-1]
    grip = _PROBES @ hand[:3, :3].T + hand[:3, 3]
    arm = arm_collision_points(frames=frames)
    pts = jnp.concatenate([grip, arm], axis=0)
    radii = jnp.concatenate(
        [jnp.full((grip.shape[0],), PROBE_RADIUS), ARM_POINT_RADII]
    )
    return pts, radii


def obstacle_cost(q, spheres, margin: float = 0.01, table_z: float = 0.0):
    """Hinge-squared penetration of the gripper + arm probes into the
    obstacle spheres (world (NOBS, 4), radius 0 = padding) and the
    table plane (all-link collision cost,
    reference: env/panda_scene.py:897-917)."""
    p, radii = _probe_world(q)  # (P, 3), (P,)
    diff = p[:, None, :] - spheres[None, :, :3]
    # eps-regularized norm: a probe exactly at a sphere center has a
    # 0/0 norm gradient that NaNs the whole CHOMP descent
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    pen = jnp.maximum(spheres[None, :, 3] + radii[:, None] + margin - d, 0.0)
    pen = jnp.where(spheres[None, :, 3] > 0, pen, 0.0)
    table_pen = jnp.maximum(table_z + radii * 0.5 - p[:, 2], 0.0)
    return jnp.sum(pen**2) + jnp.sum(table_pen**2)


# obstacle-cost fade toward the trajectory end for the *target's own*
# geometry: the grasp must end in contact, so the target repels the
# approach but not the final alignment (OMG masks the target SDF near
# the goal set the same way, reference: env/panda_scene.py:897-917)
def _target_fade(n):
    ramp = jnp.minimum(jnp.arange(n, 0, -1, dtype=jnp.float32) - 1, 4.0) / 4.0
    return ramp  # 1, 1, ..., 1, 0.75, 0.5, 0.25, 0


def _traj_cost(free_q, q0, q_end, spheres, target_spheres, table_z,
               w_smooth, w_obs):
    """free_q (M, 7) interior waypoints between fixed q0 and q_end."""
    traj = jnp.concatenate([q0[None], free_q, q_end[None]], axis=0)
    acc = traj[2:] - 2.0 * traj[1:-1] + traj[:-2]
    smooth = jnp.sum(acc**2)
    obs = jnp.sum(
        jax.vmap(lambda q: obstacle_cost(q, spheres, table_z=table_z))(traj)
    )
    fade = _target_fade(traj.shape[0])
    obs = obs + jnp.sum(
        fade * jax.vmap(
            lambda q: obstacle_cost(q, target_spheres, table_z=table_z)
        )(traj)
    )
    return w_smooth * smooth + w_obs * obs


@partial(jax.jit, static_argnames=("iters",))
@f32_matmuls
def plan_to_goal(q0, goal_pose, obstacle_spheres, iters: int = 30,
                 table_z: float = 0.0, lr: float = 0.2,
                 w_smooth: float = 1.0, w_obs: float = 50.0,
                 target_spheres=None):
    """Plan PLAN_STEPS joint waypoints from q0 (7,) to the grasp
    `goal_pose` (4, 4 world) around `obstacle_spheres` (NOBS, 4 world,
    radius 0 = padding).

    Returns (plan (PLAN_STEPS, 7), ok). Mirrors `expert_plan`
    (reference: env/panda_scene.py:920-993): trajectory optimization to
    a standoff, then a straight insertion along the grasp approach.
    `target_spheres` adds the grasp target's own geometry as an
    approach-phase obstacle whose cost fades near the standoff, so the
    expert never sweeps through the object it is about to grasp.
    """
    if target_spheres is None:
        target_spheres = jnp.zeros((0, 4))
    standoff = goal_pose.at[:3, 3].add(-STANDOFF_DIST * goal_pose[:3, 2])
    # IK seeded from q0 first: it lands on the joint-space branch nearest
    # the start, keeping the interpolated trajectory local (multi-start
    # alone can pick a far branch and the interp swings through the
    # workspace). When that branch's ARM pose collides with an obstacle
    # (all-link cost -- a forearm/elbow clash the optimizer cannot fix
    # because the standoff is a fixed endpoint), re-route through the
    # lowest-cost collision-free anchor-seed branch instead, like OMG's
    # collision-aware goal-set selection
    # (reference: env/panda_scene.py:897-917).
    from gaddpg_tpu.robot.panda import ANCHOR_SEEDS

    q_near, perr_n, rerr_n = dls_ik(q0, standoff[:3, 3], standoff[:3, :3])
    ok_near = (perr_n < 5e-3) & (rerr_n < 5e-2)
    cost_near = obstacle_cost(q_near, obstacle_spheres, margin=0.005,
                              table_z=table_z)
    qs, perrs, rerrs = jax.vmap(
        lambda s: dls_ik(s, standoff[:3, 3], standoff[:3, :3])
    )(ANCHOR_SEEDS)
    conv = (perrs < 5e-3) & (rerrs < 5e-2)
    costs = jax.vmap(
        lambda q: obstacle_cost(q, obstacle_spheres, margin=0.005,
                                table_z=table_z)
    )(qs)
    # among converged seeds: clear-of-obstacle first, then nearest start
    seed_score = jnp.where(
        conv, costs * 1e3 + 0.01 * jnp.linalg.norm(qs - q0, axis=-1), jnp.inf
    )
    best = jnp.argmin(seed_score)
    q_alt, ok_alt = qs[best], conv[best]
    use_near = ok_near & (
        (cost_near < 1e-8) | ~ok_alt | (costs[best] >= cost_near)
    )
    q_stand = jnp.where(use_near, q_near, jnp.where(ok_alt, q_alt, q_near))
    ok_stand = ok_near | ok_alt
    # seed the short insertion solve from the standoff solution
    q_final, perr, rerr = dls_ik(
        q_stand, goal_pose[:3, 3], goal_pose[:3, :3], iters=20
    )
    ok_final = (perr < 5e-3) & (rerr < 5e-2)

    # phase 1: optimized approach q0 -> q_stand
    alphas = jnp.linspace(0.0, 1.0, APPROACH_STEPS)[1:-1, None]  # (M, 1)
    free0 = q0[None] * (1.0 - alphas) + q_stand[None] * alphas

    grad_fn = jax.grad(_traj_cost)

    def gd(free, _):
        g = grad_fn(free, q0, q_stand, obstacle_spheres, target_spheres,
                    table_z, w_smooth, w_obs)
        free = free - lr * (_MINV @ g)  # CHOMP-preconditioned step
        free = jnp.clip(free, JOINT_LOWER, JOINT_UPPER)
        return free, None

    free, _ = jax.lax.scan(gd, free0, None, length=iters)
    approach = jnp.concatenate([q0[None], free, q_stand[None]], axis=0)

    # phase 2: straight insertion (the reference servos straight in from
    # the standoff; obstacles at the grasp site are the target itself)
    betas = jnp.linspace(0.0, 1.0, INSERT_STEPS + 1)[1:, None]
    insert = q_stand[None] * (1.0 - betas) + q_final[None] * betas

    plan = jnp.concatenate([approach, insert], axis=0)

    # residual clearance check on the optimized approach
    res_obs = jnp.sum(
        jax.vmap(lambda q: obstacle_cost(q, obstacle_spheres, margin=0.0,
                                         table_z=table_z - 0.01))(approach)
    )
    ok = ok_stand & ok_final & (res_obs < 1e-5)
    return plan, ok


def plan_action(hand_pose, plan, step_idx):
    """Task-space expert action tracking plan waypoint `step_idx + 1`.

    The reference executes its joint plan by step index and converts
    each waypoint to a cartesian delta against the *current* pose
    (convert_action_from_joint_to_cartesian,
    reference: env/panda_scene.py:1118-1139, core/train_online.py:255),
    which self-corrects drift while keeping progress monotone.
    """
    nxt = jnp.minimum(step_idx + 1, plan.shape[0] - 1)
    target = fk_hand(plan[nxt])
    rel = se3_inverse(hand_pose) @ target
    action = jnp.concatenate([rel[:3, 3], mat_to_euler(rel[:3, :3])])
    high = jnp.asarray(TASK6D_HIGH)
    return jnp.clip(action, -high, high)
