"""Accumulated point-cloud state construction.

The reference merges each step's backprojected target points into a
world-frame accumulation cloud with a per-step retention ratio
0.95^step on the *new* points, then resamples to exactly 1024 points +
6 hand anchor points for the policy state
(reference: env/panda_scene.py:698-714,1178-1206).

Points carry a per-point label in the state's 4th channel: 1 = hand
anchor, 0 = target surface (the reference's two classes,
reference: env/panda_scene.py:1195-1200), and -1 = obstacle surface --
an extension past the reference's target-only cloud: in clutter scenes
the reference policy is collision-blind (its collisions are only
LOGGED, env/panda_scene.py:1078-1095); labeling visible obstacle
points lets the policy learn avoidance (round-3 clutter recipe).

Implementation notes: the reservoir ring-writes contiguously from slot
0, so the valid region is always [0, min(count, capacity)) -- sampling
is a plain `randint` gather and insertion a prefix-sum scatter. No
sorts anywhere (argsort/top_k dominated the observation cost).
"""

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from gaddpg_tpu.geometry.gripper import HAND_FINGER_POINTS

TARGET_LABEL = 0.0
HAND_LABEL = 1.0
OBSTACLE_LABEL = -1.0


@struct.dataclass
class PointCloudState:
    points: jnp.ndarray   # (CAP, 3) world frame
    labels: jnp.ndarray   # (CAP,) TARGET/OBSTACLE label per point
    count: jnp.ndarray    # scalar int32: total points ever kept (saturating)
    cursor: jnp.ndarray   # scalar int32 ring cursor


def create_pc_state(capacity: int = 2048) -> PointCloudState:
    return PointCloudState(
        points=jnp.zeros((capacity, 3)),
        labels=jnp.zeros((capacity,)),
        count=jnp.asarray(0, jnp.int32),
        cursor=jnp.asarray(0, jnp.int32),
    )


def num_valid(pc: PointCloudState):
    return jnp.minimum(pc.count, pc.points.shape[0])


@partial(jax.jit, static_argnames=())
def accumulate_points(pc: PointCloudState, key, new_points, new_valid, env_step,
                      accumulate_ratio: float = 0.95,
                      label: float = TARGET_LABEL) -> PointCloudState:
    """Insert a decayed subset of this step's points into the reservoir.

    Keeps `accumulate_ratio**env_step` of the new points (the
    reference's decay schedule on new points,
    reference: env/panda_scene.py:707-711) and ring-writes them over the
    oldest entries. `label` tags the whole batch (TARGET_LABEL for
    target surface points, OBSTACLE_LABEL for clutter surface points).
    """
    n = new_points.shape[0]
    cap = pc.points.shape[0]
    keep_frac = accumulate_ratio ** env_step.astype(jnp.float32)
    keep = (jax.random.uniform(key, (n,)) < keep_frac) & new_valid
    # prefix-sum compaction: kept point k -> ring slot cursor + k
    slot = jnp.cumsum(keep) - 1
    n_keep = jnp.sum(keep).astype(jnp.int32)
    idx = (pc.cursor + slot) % cap
    idx = jnp.where(keep, idx, cap)  # dropped
    return PointCloudState(
        points=pc.points.at[idx].set(new_points, mode="drop"),
        labels=pc.labels.at[idx].set(
            jnp.full((n,), label, pc.labels.dtype), mode="drop"),
        count=pc.count + n_keep,
        cursor=(pc.cursor + n_keep) % cap,
    )


@partial(jax.jit, static_argnames=("num_pts",))
def build_point_state(pc: PointCloudState, key, ef_pose_inv, num_pts: int = 1024):
    """Assemble the 4 x (6 + num_pts) policy point state in the hand frame.

    Channel 3 flags the 6 hand anchor points with HAND_LABEL and
    carries each sampled point's TARGET/OBSTACLE label
    (reference: env/panda_scene.py:1195-1200 for the two reference
    classes). Returns (state, n_target) where n_target counts TARGET
    points currently in the reservoir -- scene-validity checks must
    not be satisfied by obstacle-only views
    (reference: core/utils.py:140)."""
    n_valid = num_valid(pc)
    idx = jax.random.randint(key, (num_pts,), 0, jnp.maximum(n_valid, 1))
    sampled = jnp.take(pc.points, idx, axis=0)
    slabels = jnp.take(pc.labels, idx, axis=0)
    local = sampled @ ef_pose_inv[:3, :3].T + ef_pose_inv[:3, 3]
    local = jnp.where(n_valid > 0, local, 0.0)
    slabels = jnp.where(n_valid > 0, slabels, 0.0)

    hand_pts = HAND_FINGER_POINTS.T  # (6, 3)
    pts = jnp.concatenate([hand_pts, local], axis=0)   # (6+N, 3)
    flags = jnp.concatenate(
        [jnp.full((6,), HAND_LABEL, slabels.dtype), slabels])
    state = jnp.concatenate([pts, flags[:, None]], axis=-1).T  # (4, 6+N)
    in_range = jnp.arange(pc.labels.shape[0]) < n_valid
    n_target = jnp.sum(
        (pc.labels == TARGET_LABEL) & in_range).astype(jnp.int32)
    return state, n_target
