"""Reference-format .npz import/export for offline datasets.

The reference trains offline from a single `data_50k.npz` holding the
whole buffer attribute dump (reference: core/replay_memory.py:274-356).
We read/write the same keys so its datasets can be replayed here and
vice versa. Host-side numpy only -- called outside jit.
"""

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from gaddpg_tpu.replay.buffer import ReplayBuffer, create_buffer

_SAVE_KEYS = (
    "action", "point_state", "reward", "terminal", "timestep", "returns",
    "state_pose", "collide", "collide_future", "grasp", "perturb_flags",
    "goal", "expert_flags", "expert_action", "target_idx", "episode_map",
)


def save_npz(buf: ReplayBuffer, path: str, trim: bool = True):
    """Dump the buffer. `trim=True` saves only the live transitions
    (the reference dumps full preallocated arrays, which makes mostly
    empty multi-GB files; the loader accepts either)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = buf.size if not trim else max(int(buf.filled), 1)
    save = {k: np.asarray(getattr(buf, k))[:n] for k in _SAVE_KEYS}
    # image-mode buffers carry real (C, H, W) frames; point-cloud-only
    # buffers use a (1, 1, 1) placeholder that is not worth a dump.
    # f16 on disk halves the file (frames are [0, 1] RGB + metric depth)
    img = np.asarray(buf.image_state)
    if img.ndim == 4 and img.shape[1:] != (1, 1, 1):
        save["image_state"] = img[:n].astype(np.float16)
    save["is_full"] = bool(buf.is_full)
    save["filled"] = int(buf.filled)
    save["cur_idx"] = int(buf.cur_idx)
    save["total_env_step"] = int(buf.total_env_step)
    np.savez(path, **save)


def load_npz(path: str, buffer_size: Optional[int] = None,
             num_points: int = 1030) -> ReplayBuffer:
    """Load a reference-format buffer dump into a ReplayBuffer.

    Recomputes nothing: the reference re-derives returns on load
    (reference: :321), but exported files already carry consistent
    returns; callers can re-backfill if mixing gammas.
    """
    data = np.load(path, allow_pickle=True)
    n = int(np.amax(data["episode_map"])) + 1 if "episode_map" in data else len(data["reward"])
    size = buffer_size or max(n, 1)
    # image-mode dumps carry a real (S, C, H, W) image_state; recreate
    # the buffer with matching image storage (use_image training)
    img_shape = None
    if "image_state" in data:
        ish = tuple(np.asarray(data["image_state"]).shape[1:])
        if len(ish) == 3 and ish != (1, 1, 1):
            img_shape = ish
    buf = create_buffer(size, num_points=num_points, image_shape=img_shape)

    upd = {}
    load_keys = _SAVE_KEYS + (("image_state",) if img_shape else ())
    for k in load_keys:
        if k not in data:
            continue
        src = np.asarray(data[k])
        if src.ndim == 0:
            continue
        m = min(size, src.shape[0])
        tgt = np.asarray(getattr(buf, k)).copy()
        if k == "point_state" and src.shape[-1] != tgt.shape[-1]:
            p = min(src.shape[-1], tgt.shape[-1])
            tgt[:m, :, :p] = src[:m, :, :p]
        elif k in ("action", "expert_action") and src.ndim == 3:
            tgt[:m] = src[:m, 0]  # reference stores (N, 1, 6)
        else:
            tgt[:m] = src[:m]
        upd[k] = jnp.asarray(tgt, dtype=getattr(buf, k).dtype)

    if "collide_future" not in data and "collide" in data and "episode_map" in data:
        # datasets saved before the collision-aware losses: backfill
        # collide_future[i] = any collide in [i, episode_map[i]]
        col = np.asarray(data["collide"], np.float32)
        ep_end = np.asarray(data["episode_map"], np.int64)
        fut = col.copy()
        for i in range(len(col) - 2, -1, -1):
            if ep_end[i] > i:
                fut[i] = max(col[i], fut[i + 1])
        tgt = np.zeros(size, np.float32)
        m = min(size, len(fut))
        tgt[:m] = fut[:m]
        upd["collide_future"] = jnp.asarray(tgt)

    cur = int(data["cur_idx"]) if "cur_idx" in data else n
    if "filled" in data:
        filled = int(data["filled"])
    elif bool(data.get("is_full", False)):
        filled = size
    else:
        filled = cur
    return buf.replace(
        **upd,
        cur_idx=jnp.asarray(min(cur, size), jnp.int32),
        filled=jnp.asarray(min(filled, size), jnp.int32),
        total_env_step=jnp.asarray(int(data.get("total_env_step", n)), jnp.int32),
    )
