"""Milestone schedules for exploration/noise (host-side, plain python).

(reference: core/train_online.py:533-537, experiments/config.py:150-153)
"""

import numpy as np


def _valid_index(arr, idx):
    return arr[min(len(arr) - 1, idx)]


def explore_schedule(update_step, cfg):
    """Fraction of envs rolling the policy instead of the expert."""
    idx = int(np.sum(update_step > np.asarray(cfg.mix_milestones)))
    ratio = cfg.explore_ratio * _valid_index(cfg.explore_ratio_list, idx)
    return min(ratio, cfg.explore_cap)


def noise_schedule(update_step, cfg):
    """Exploration noise scale multiplier."""
    idx = int(np.sum(update_step > np.asarray(cfg.mix_milestones)))
    return _valid_index(cfg.noise_ratio_list, idx)
