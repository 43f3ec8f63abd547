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


def _mat_paths_to_names(path_arr) -> list:
    """The reference's `path` entries are object directories like
    'data/objects/025_mug/' (env/panda_scene.py:642-659: the target's
    name is the last path component). loadmat yields either a padded
    char matrix or an object array of str -- normalize both."""
    names = []
    arr = np.atleast_1d(np.asarray(path_arr))
    for e in arr.reshape(-1):
        # cell arrays load as object elements wrapping a string array
        sub = np.atleast_1d(np.asarray(e))
        s = str(sub.reshape(-1)[0]) if sub.size else ""
        s = s.strip().rstrip("/")
        if s:
            names.append(s.split("/")[-1])
    return names


def import_mat_scene(path: str, name_to_idx: Optional[dict] = None) -> Dict:
    """Import a reference scene_{k}.mat into the Scene dict format.

    The reference layout (env/panda_scene.py:628-668,
    core/train_test_offline.py:181-184): `pose` is an (N, 4, 4) stack
    of object pose matrices, `path` lists the object mesh directories
    with the TARGET first (panda_scene.py:657-659 takes
    objects_paths[0]), and optional `init_joints` carries the arm
    configuration. The reference's quaternions are xyzw (ros_quat);
    we derive wxyz directly from the rotation matrix instead.

    Older/foreign dumps with flat [t(3), q(4)] poses and joints under
    other key names are still accepted via key probing.
    """
    from scipy.io import loadmat

    from gaddpg_tpu.geometry.rotations import mat_to_quat
    from gaddpg_tpu.robot.panda import DEFAULT_JOINTS

    m = loadmat(path)
    joints = None
    for k in ("init_joints", "joints", "arm_joints", "robot_joints"):
        if k in m:
            joints = np.asarray(m[k], np.float64).reshape(-1)[:7]
            break
    if joints is None:
        # the reference falls back to its default init when the scene
        # carries no init_joints (panda_scene.py:666-667 is optional)
        joints = np.asarray(DEFAULT_JOINTS, np.float64).reshape(-1)[:7]

    pose = None
    for k in ("pose", "obj_poses", "object_poses", "poses"):
        if k in m:
            pose = np.asarray(m[k], np.float64)
            break
    if pose is None:
        raise ValueError(
            f"unrecognized scene file {path}: keys {sorted(m.keys())}"
        )

    if pose.ndim >= 2 and pose.shape[-2:] == (4, 4):
        # reference layout: target placement = poses[0]
        t_pose = pose.reshape(-1, 4, 4)[0]
        obj_pos = t_pose[:3, 3]
        obj_quat = np.asarray(mat_to_quat(t_pose[:3, :3]))  # wxyz
    else:
        flat = pose.reshape(-1)[:7]  # legacy [t(3), q(4)] packed
        obj_pos, obj_quat = flat[:3], flat[3:7]

    obj_idx = 0
    target_name = None
    if "path" in m:
        names = _mat_paths_to_names(m["path"])
        if names:
            target_name = names[0]
    elif "target_name" in m:
        target_name = str(np.asarray(m["target_name"]).reshape(-1)[0])
    if name_to_idx and target_name is not None:
        obj_idx = name_to_idx.get(target_name, 0)

    return {
        "obj_idx": np.asarray([obj_idx], np.int32),
        "obj_pos": np.asarray(obj_pos)[None].astype(np.float32),
        "obj_quat": np.asarray(obj_quat)[None].astype(np.float32),
        "joints": np.asarray(joints)[None].astype(np.float32),
        "ik_ok": np.asarray([True]),
    }
