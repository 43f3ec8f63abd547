"""Episode recording for offline visualization.

The reference writes rollout videos via OpenCV and a Blender-recorder
variant (reference: core/utils.py:370-406,
core/train_test_offline_blender.py). Here an episode records the full
pose stream (joints, object pose, goal) to .npz; any renderer --
matplotlib, Blender import script, or the point-splat camera -- can
replay it offline.
"""

import os
from typing import Dict, List

import numpy as np


class EpisodeRecorder:
    def __init__(self):
        self.frames: List[Dict[str, np.ndarray]] = []

    def add(self, state, obs=None, action=None, extra=None):
        frame = {
            "joints": np.asarray(state.phys.arm.q),
            "obj_pos": np.asarray(state.phys.obj.pos),
            "obj_quat": np.asarray(state.phys.obj.quat),
            "obj_idx": np.asarray(state.obj_idx),
            "goal_obj": np.asarray(state.goal_obj),
        }
        if obs is not None:
            frame["ef_pose"] = np.asarray(obs.ef_pose)
            frame["num_points"] = np.asarray(obs.num_points)
        if action is not None:
            frame["action"] = np.asarray(action)
        if extra:
            frame.update({k: np.asarray(v) for k, v in extra.items()})
        self.frames.append(frame)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not self.frames:
            return
        stacked = {
            k: np.stack([f[k] for f in self.frames])
            for k in self.frames[0]
            if all(k in f for f in self.frames)
        }
        np.savez(path, **stacked)

    def __len__(self):
        return len(self.frames)
