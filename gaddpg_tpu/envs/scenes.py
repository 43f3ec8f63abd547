"""Deterministic evaluation scenes: generate, save, load.

The reference evaluates on pre-generated `scene_{k}.mat` files holding
object placement + initial joints (reference:
core/train_test_offline.py:176-256, env/panda_scene.py:336-343,
experiments/config.py:62 RL_TEST_SCENE). Here a scene set is one .npz
of stacked Scene dicts; `import_mat_scene` reads the reference's .mat
layout when such files are provided.
"""

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

_FIELDS = ("obj_idx", "obj_pos", "obj_quat", "joints", "ik_ok",
           "clutter_idx", "clutter_pos", "clutter_quat")


def generate_scenes(env, key, num_scenes: int, oversample: int = 2) -> Dict:
    """Sample `num_scenes` *valid* scenes with the env's reset logic.

    Generates `oversample * num_scenes` candidates in one vmapped pass
    and keeps the valid ones (reference retries per scene,
    reference: core/train_online.py:180-188).
    """
    n_cand = num_scenes * oversample
    keys = jax.random.split(key, n_cand)
    scenes = jax.vmap(env.sample_scene)(keys)
    states, obs = jax.vmap(env.reset_scene)(scenes, keys)
    valid = np.asarray(states.valid_scene)
    idx = np.nonzero(valid)[0]
    if len(idx) < num_scenes:
        idx = np.concatenate([idx, np.nonzero(~valid)[0]])[:num_scenes]
    else:
        idx = idx[:num_scenes]
    return {k: np.asarray(v)[idx] for k, v in scenes.items()}


def save_scenes(scenes: Dict, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in scenes.items()})


def load_scenes(path: str) -> Dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in _FIELDS if k in data}


def scene_slice(scenes: Dict, start: int, count: int) -> Dict:
    """Wrap-around slice so any eval wave size works."""
    n = len(np.asarray(scenes["obj_idx"]))
    idx = (np.arange(start, start + count)) % n
    return {k: jnp.asarray(np.asarray(v)[idx]) for k, v in scenes.items()}


def import_mat_scene(path: str, name_to_idx: Optional[dict] = None) -> Dict:
    """Best-effort import of a reference scene_{k}.mat.

    The reference scene files carry object pose(s) and arm joints;
    key names vary across generations, so probe the common ones.
    """
    from scipy.io import loadmat

    m = loadmat(path)
    joints = None
    for k in ("joints", "init_joints", "arm_joints", "robot_joints"):
        if k in m:
            joints = np.asarray(m[k]).reshape(-1)[:7]
            break
    pose = None
    for k in ("pose", "obj_poses", "object_poses", "poses"):
        if k in m:
            pose = np.asarray(m[k])
            break
    if pose is None or joints is None:
        raise ValueError(
            f"unrecognized scene file {path}: keys {sorted(m.keys())}"
        )
    pose = pose.reshape(-1)[:7]  # [t(3), q(4)] packed
    obj_idx = 0
    if name_to_idx and "target_name" in m:
        obj_idx = name_to_idx.get(str(m["target_name"]), 0)
    return {
        "obj_idx": np.asarray([obj_idx], np.int32),
        "obj_pos": pose[None, :3].astype(np.float32),
        "obj_quat": pose[None, 3:7].astype(np.float32),
        "joints": joints[None].astype(np.float32),
        "ik_ok": np.asarray([True]),
    }
