"""Accumulated point-cloud state construction.

The reference merges each step's backprojected target points into a
world-frame accumulation cloud with a per-step retention ratio
0.95^step on the *new* points, then resamples to exactly 1024 points +
6 hand anchor points for the policy state
(reference: env/panda_scene.py:698-714,1178-1206). Variable-length numpy
arrays become a fixed-capacity reservoir here.
"""

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from gaddpg_tpu.geometry.gripper import HAND_FINGER_POINTS
from gaddpg_tpu.ops.sampling import regularize_point_count


@struct.dataclass
class PointCloudState:
    points: jnp.ndarray   # (CAP, 3) world frame
    valid: jnp.ndarray    # (CAP,) bool
    cursor: jnp.ndarray   # scalar int32 ring cursor


def create_pc_state(capacity: int = 2048) -> PointCloudState:
    return PointCloudState(
        points=jnp.zeros((capacity, 3)),
        valid=jnp.zeros((capacity,), bool),
        cursor=jnp.asarray(0, jnp.int32),
    )


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
    keep_frac = accumulate_ratio ** env_step.astype(jnp.float32)
    keep = (jax.random.uniform(key, (n,)) < keep_frac) & new_valid
    # compact kept points to the front
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    pts = jnp.take(new_points, order, axis=0)
    n_keep = jnp.sum(keep).astype(jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    live = pos < n_keep
    cap = pc.points.shape[0]
    idx = (pc.cursor + pos) % cap
    idx = jnp.where(live, idx, cap)  # dropped
    return PointCloudState(
        points=pc.points.at[idx].set(pts, mode="drop"),
        valid=pc.valid.at[idx].set(True, mode="drop"),
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
    sampled, _ = regularize_point_count(
        key, pc.points, num_pts, valid=pc.valid
    )
    local = sampled @ ef_pose_inv[:3, :3].T + ef_pose_inv[:3, 3]
    n_valid = jnp.sum(pc.valid)
    # zero out everything if no points at all (pre-first-observation)
    local = jnp.where(n_valid > 0, local, 0.0)

    hand_pts = HAND_FINGER_POINTS.T  # (6, 3)
    pts = jnp.concatenate([hand_pts, local], axis=0)   # (6+N, 3)
    flags = jnp.zeros((pts.shape[0],)).at[:6].set(1.0)
    state = jnp.concatenate([pts, flags[:, None]], axis=-1).T  # (4, 6+N)
    return state, n_valid
