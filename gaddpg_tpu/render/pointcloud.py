"""Accumulated point-cloud state construction.

The reference merges each step's backprojected target points into a
world-frame accumulation cloud with a per-step retention ratio
0.95^step on the *new* points, then resamples to exactly 1024 points +
6 hand anchor points for the policy state
(reference: env/panda_scene.py:698-714,1178-1206).

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


@struct.dataclass
class PointCloudState:
    points: jnp.ndarray   # (CAP, 3) world frame
    count: jnp.ndarray    # scalar int32: total points ever kept (saturating)
    cursor: jnp.ndarray   # scalar int32 ring cursor


def create_pc_state(capacity: int = 2048) -> PointCloudState:
    return PointCloudState(
        points=jnp.zeros((capacity, 3)),
        count=jnp.asarray(0, jnp.int32),
        cursor=jnp.asarray(0, jnp.int32),
    )


def num_valid(pc: PointCloudState):
    return jnp.minimum(pc.count, pc.points.shape[0])


@partial(jax.jit, static_argnames=())
def accumulate_points(pc: PointCloudState, key, new_points, new_valid, env_step,
                      accumulate_ratio: float = 0.95) -> PointCloudState:
    """Insert a decayed subset of this step's points into the reservoir.

    Keeps `accumulate_ratio**env_step` of the new points (the
    reference's decay schedule on new points,
    reference: env/panda_scene.py:707-711) and ring-writes them over the
    oldest entries.
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
        count=pc.count + n_keep,
        cursor=(pc.cursor + n_keep) % cap,
    )


@partial(jax.jit, static_argnames=("num_pts",))
def build_point_state(pc: PointCloudState, key, ef_pose_inv, num_pts: int = 1024):
    """Assemble the 4 x (6 + num_pts) policy point state in the hand frame.

    Channel 3 flags the 6 hand anchor points
    (reference: env/panda_scene.py:1195-1200). Returns (state, n_points)
    where n_points counts valid accumulated points (scene validity
    checks use it, reference: core/utils.py:140).
    """
    n_valid = num_valid(pc)
    idx = jax.random.randint(key, (num_pts,), 0, jnp.maximum(n_valid, 1))
    sampled = jnp.take(pc.points, idx, axis=0)
    local = sampled @ ef_pose_inv[:3, :3].T + ef_pose_inv[:3, 3]
    local = jnp.where(n_valid > 0, local, 0.0)

    hand_pts = HAND_FINGER_POINTS.T  # (6, 3)
    pts = jnp.concatenate([hand_pts, local], axis=0)   # (6+N, 3)
    flags = jnp.zeros((pts.shape[0],)).at[:6].set(1.0)
    state = jnp.concatenate([pts, flags[:, None]], axis=-1).T  # (4, 6+N)
    return state, n_valid
