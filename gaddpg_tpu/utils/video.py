"""Rollout video / visual observability.

Counterpart of the reference's rollout videos + visdom image stream
(reference: core/utils.py:370-406 write_video,
core/train_online.py:276-282): episodes recorded as RGBDM frame stacks
become MP4/GIF files or tiled PNG strips under output/, so grasp
behavior is debuggable visually instead of through scalars only.

Host-side numpy + imageio; rendering happens on-device through the
env's existing RGBDM camera.
"""

import os
from typing import Optional, Sequence

import numpy as np


def rgbdm_to_rgb(frame: np.ndarray) -> np.ndarray:
    """(5, H, W) RGBDM -> (H, W, 3) uint8 with depth/mask side panels."""
    rgb = np.clip(np.asarray(frame[:3], np.float32), 0, 1)
    rgb = (np.transpose(rgb, (1, 2, 0)) * 255).astype(np.uint8)
    d = np.asarray(frame[3], np.float32)
    lo, hi = 0.0, max(float(d.max()), 1e-6)
    dn = ((1.0 - np.clip((d - lo) / (hi - lo), 0, 1)) * 255).astype(np.uint8)
    depth_rgb = np.stack([dn, dn, dn], axis=-1)
    mask = (np.asarray(frame[4]) == 0).astype(np.uint8) * 255  # target white
    mask_rgb = np.stack([mask, mask, mask], axis=-1)
    return np.concatenate([rgb, depth_rgb, mask_rgb], axis=1)


def write_video(frames: Sequence[np.ndarray], path: str, fps: int = 6):
    """Frames (T, 5, H, W) RGBDM (or (T, H, W, 3) uint8) -> gif/mp4.

    GIF needs no native encoder (PIL backend); mp4 works when an ffmpeg
    backend is installed."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [
        rgbdm_to_rgb(f) if np.asarray(f).ndim == 3 and np.asarray(f).shape[0] == 5
        else np.asarray(f)
        for f in frames
    ]
    if path.endswith(".gif"):
        imageio.mimsave(path, imgs, duration=int(1000 / fps), loop=0)
    else:
        imageio.mimsave(path, imgs, fps=fps)
    return path


def write_strip(frames: Sequence[np.ndarray], path: str,
                max_frames: int = 8):
    """Tile episode frames into one PNG strip (cheap glanceable record)."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fr = list(frames)
    if len(fr) > max_frames:
        idx = np.linspace(0, len(fr) - 1, max_frames).astype(int)
        fr = [fr[i] for i in idx]
    imgs = [
        rgbdm_to_rgb(f) if np.asarray(f).ndim == 3 and np.asarray(f).shape[0] == 5
        else np.asarray(f)
        for f in fr
    ]
    imageio.imwrite(path, np.concatenate(imgs, axis=0))
    return path


def record_episode(env, agent_state, select_action, key, scene=None,
                   max_steps: int = 24, use_image_policy: bool = False,
                   obj_idx=None):
    """Roll one episode with RGBDM rendering forced on; returns
    (frames (T, 5, H, W) numpy, success, info_list).

    Works with any env params: a render-enabled clone of the env is
    created when use_image is off.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gaddpg_tpu.envs.grasp_env import PandaGraspEnv

    p = env.p if env.p.use_image else dataclasses.replace(env.p, use_image=True)
    venv = PandaGraspEnv(p, env.lib)
    k_reset, key = jax.random.split(key)
    if scene is not None:
        state, obs = jax.jit(venv.reset_scene)(scene, k_reset)
    else:
        state, obs = jax.jit(venv.reset)(k_reset, obj_idx=obj_idx)
    step = jax.jit(venv.step)
    frames, infos = [np.asarray(obs.image)], []
    for t in range(max_steps):
        key, k1, k2 = jax.random.split(key, 3)
        if select_action is None:
            action = venv.expert_action(state)
        else:
            inp = obs.image if use_image_policy else obs.point_state
            remain = jnp.asarray(float(max_steps - t))
            action, _ = select_action(
                agent_state, inp[None], remain[None], k1, 0.0, False
            )
            action = action[0]
        state, obs, r, done, info = step(state, action, k2)
        frames.append(np.asarray(obs.image))
        infos.append({k: float(v) for k, v in info.items()})
        if bool(done):
            break
    state, reward = jax.jit(venv.retract)(state, key)
    return np.stack(frames), float(reward), infos
