"""Fixed-shape replay ring buffer as a JAX pytree.

Semantics mirror `BaseMemory` (reference: core/replay_memory.py):
- flat transition storage with an `episode_map` pointing every index at
  its episode's last transition (reference: :230),
- discounted-return backfill at insert time (reference: :223-228),
- `sample` draws uniform indices in [episode_max_len, upper) and builds
  next-state views via `min(episode_map[i], i+1)` (reference: :251-266),
- remaining-time feature = timestep[episode_end] + 1 - timestep[i]
  (reference: :266),
- optional on-policy goal relabeling from stored hand poses
  (reference: :233-249).

Shapes are static: episodes arrive as (T_max, ...) with a validity mask,
so the same jitted insert serves every rollout regardless of early
termination.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from gaddpg_tpu.geometry.se3 import se3_inverse, pack_pose_rot_first


@struct.dataclass
class ReplayBuffer:
    # transition storage
    point_state: jnp.ndarray      # (S, 4, P) point cloud state
    image_state: jnp.ndarray      # (S, 5, H, W) RGBDM; (S, 1, 1, 1) disabled
    action: jnp.ndarray           # (S, 6)
    expert_action: jnp.ndarray    # (S, 6)
    reward: jnp.ndarray           # (S,)
    returns: jnp.ndarray          # (S,)
    terminal: jnp.ndarray         # (S,)
    timestep: jnp.ndarray         # (S,)
    state_pose: jnp.ndarray       # (S, 4, 4) hand pose in world
    goal: jnp.ndarray             # (S, 7) [q, t] grasp goal in hand frame
    expert_flags: jnp.ndarray     # (S,)
    perturb_flags: jnp.ndarray    # (S,)
    collide: jnp.ndarray          # (S,)
    collide_future: jnp.ndarray   # (S,) any collision at/after this step
    grasp: jnp.ndarray            # (S,)
    target_idx: jnp.ndarray       # (S,)
    episode_map: jnp.ndarray      # (S,) uint32 index of episode end
    # cursors
    cur_idx: jnp.ndarray          # scalar int32 next write position
    filled: jnp.ndarray           # scalar int32 high-water mark of live data
    total_env_step: jnp.ndarray   # scalar int32

    @property
    def size(self) -> int:
        return self.point_state.shape[0]

    @property
    def is_full(self):
        return self.filled >= self.size


def create_buffer(size: int, num_points: int = 1030, dtype=jnp.float32,
                  point_dtype=None, image_shape=None,
                  image_dtype=None) -> ReplayBuffer:
    """point_dtype (e.g. jnp.bfloat16) halves the dominant array: the
    point clouds are (size, 4, num_points) and dwarf everything else
    (the reference stores them as float64 numpy,
    reference: core/replay_memory.py:376). `image_shape` (C, H, W)
    enables RGBDM storage for image-mode training (use_image,
    reference: experiments/config.py:105); bfloat16 by default since
    images dominate memory."""
    f = lambda *shape: jnp.zeros(shape, dtype)
    img_shape = image_shape or (1, 1, 1)
    return ReplayBuffer(
        point_state=jnp.zeros((size, 4, num_points), point_dtype or dtype),
        image_state=jnp.zeros((size, *img_shape),
                              image_dtype or (jnp.bfloat16 if image_shape else dtype)),
        action=f(size, 6),
        expert_action=f(size, 6),
        reward=f(size),
        returns=f(size),
        terminal=f(size),
        timestep=f(size),
        state_pose=jnp.tile(jnp.eye(4, dtype=dtype), (size, 1, 1)),
        goal=f(size, 7),
        expert_flags=f(size),
        perturb_flags=f(size),
        collide=f(size),
        collide_future=f(size),
        grasp=f(size),
        target_idx=f(size),
        episode_map=jnp.zeros((size,), jnp.uint32),
        cur_idx=jnp.asarray(0, jnp.int32),
        filled=jnp.asarray(0, jnp.int32),
        total_env_step=jnp.asarray(0, jnp.int32),
    )


_EP_FIELDS = (
    "point_state", "image_state", "action", "expert_action", "reward",
    "terminal", "timestep", "state_pose", "goal", "expert_flags",
    "perturb_flags", "collide", "grasp", "target_idx",
)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("gamma",))
def add_episode(buf: ReplayBuffer, episode: Dict[str, jnp.ndarray], valid: jnp.ndarray,
                gamma: float = 0.95) -> ReplayBuffer:
    """Insert one fixed-length episode (T, ...) masked by `valid` (T,).

    Transitions are compacted to the front (valid-first) before the ring
    write, the discounted return is backfilled from the last valid
    reward, and episode_map points at the final valid slot.

    Episodes never straddle the ring boundary: when the episode would
    not fit in [cur_idx, size) the write restarts at 0, mirroring the
    reference's buffer-start reset (reference: core/replay_memory.py:193-199).
    Splitting would corrupt next-state indexing, which assumes ascending
    contiguous episode slots.
    """
    T = valid.shape[0]
    size = buf.size
    n_valid = jnp.sum(valid).astype(jnp.int32)

    # compact valid transitions to the front, preserving order
    # (fields absent from the episode -- e.g. image_state in point-cloud
    # runs -- keep their buffer contents)
    fields = tuple(k for k in _EP_FIELDS if k in episode)
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    ep = {k: jnp.take(episode[k], order, axis=0) for k in fields}
    pos = jnp.arange(T, dtype=jnp.int32)
    is_live = pos < n_valid

    # discounted return backfill (reference: core/replay_memory.py:223-228)
    rew = jnp.where(is_live, ep["reward"], 0.0)

    def scan_back(cost_to_go, i):
        r = rew[i] + gamma * cost_to_go
        live = is_live[i]
        ret = jnp.where(live, r, 0.0)
        return jnp.where(live, r, cost_to_go * 0.0), ret

    _, rets_rev = jax.lax.scan(scan_back, 0.0, jnp.arange(T - 1, -1, -1))
    returns = rets_rev[::-1]

    # future-collision backfill: collide_future[i] = any collide in
    # [i, episode end]. The collision-aware losses consume this -- the
    # action at step i is what committed the episode to the later
    # contact (the reference logs per-episode collision the same way,
    # reference: env/panda_scene.py:1078-1095)
    if "collide" in ep:
        col = jnp.where(is_live, ep["collide"], 0.0)
        collide_future = jax.lax.associative_scan(jnp.maximum, col, reverse=True)
    else:
        collide_future = jnp.zeros(T)

    # ring indices; restart at 0 instead of splitting across the wrap
    start = jnp.where(buf.cur_idx + n_valid > size, 0, buf.cur_idx)
    idx = jnp.where(is_live, start + pos, size)  # OOB -> dropped by scatter
    end_idx = start + n_valid - 1

    updates = {k: ep[k] for k in fields}
    updates["returns"] = returns
    if "collide" in ep:
        updates["collide_future"] = collide_future

    new_fields = {}
    for k, v in updates.items():
        new_fields[k] = getattr(buf, k).at[idx].set(
            v.astype(getattr(buf, k).dtype), mode="drop"
        )
    new_fields["episode_map"] = buf.episode_map.at[idx].set(
        end_idx.astype(jnp.uint32), mode="drop"
    )

    new_cur = start + n_valid
    return buf.replace(
        **new_fields,
        cur_idx=new_cur,
        filled=jnp.maximum(buf.filled, new_cur),
        total_env_step=buf.total_env_step + n_valid,
    )


def add_episodes(buf: ReplayBuffer, episodes: Dict[str, jnp.ndarray],
                 valid: jnp.ndarray, gamma: float = 0.95) -> ReplayBuffer:
    """Insert a batch of episodes (E, T, ...) via scan (order = env index)."""

    def body(b, inp):
        ep, v = inp
        return add_episode(b, ep, v, gamma=gamma), None

    buf, _ = jax.lax.scan(body, buf, (episodes, valid))
    return buf


def upper_idx(buf: ReplayBuffer):
    """Exclusive upper bound of live data (high-water mark)."""
    return jnp.maximum(buf.filled, 1)


@partial(jax.jit, static_argnames=("batch_size", "episode_max_len", "onpolicy_goal"))
def sample(buf: ReplayBuffer, key, batch_size: int, episode_max_len: int = 20,
           onpolicy_goal: bool = False) -> Dict[str, jnp.ndarray]:
    """Uniform batch with next-state indexing (reference: :166-176, :251-272)."""
    upper = upper_idx(buf)
    lo = jnp.minimum(episode_max_len, upper - 1)
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(upper - lo, 1)) + lo
    ep_end = buf.episode_map[idx].astype(jnp.int32)
    nxt = jnp.minimum(ep_end, idx + 1)

    goal = buf.goal[idx]
    next_goal = buf.goal[nxt]
    if onpolicy_goal:
        # HER-style relabel for non-expert steps: goal = pose_now^-1 @ pose_end
        rel = se3_inverse(buf.state_pose[idx]) @ buf.state_pose[ep_end]
        rel_n = se3_inverse(buf.state_pose[nxt]) @ buf.state_pose[ep_end]
        mask = (buf.expert_flags[idx] == 0.0)[:, None]
        goal = jnp.where(mask, pack_pose_rot_first(rel), goal)
        next_goal = jnp.where(mask, pack_pose_rot_first(rel_n), next_goal)

    out_img = {}
    if buf.image_state.shape[-1] > 1:  # image storage enabled
        out_img = {
            "image_state": buf.image_state[idx].astype(jnp.float32),
            "next_image_state": buf.image_state[nxt].astype(jnp.float32),
        }
    return {
        **out_img,
        "point_state": buf.point_state[idx],
        "next_point_state": buf.point_state[nxt],
        "action": buf.action[idx],
        "expert_action": buf.expert_action[idx],
        "next_action": buf.action[nxt],
        "reward": buf.reward[idx],
        "return": buf.returns[idx],
        "next_return": buf.returns[nxt],
        "terminal": buf.terminal[idx],
        # remaining timesteps (reference: core/replay_memory.py:266)
        "time": buf.timestep[ep_end] + 1.0 - buf.timestep[idx],
        "goal": goal,
        "next_goal": next_goal,
        "expert_flags": buf.expert_flags[idx],
        "perturb_flags": buf.perturb_flags[idx],
        "collide": buf.collide[idx],
        "collide_future": buf.collide_future[idx],
        "batch_idx": idx,
    }
