"""Demo-curation filters: success filter + collision-aware filters.

Regression tests for the round-3 bug where `policy="BC"` left
`cfg.rl=True`, so Trainer.collect's demo-curation block (success
filter, dagger_success_filter, demo_collision_filter -- the rebuild's
training-side use of the reference's collision accounting,
reference: env/panda_scene.py:1078-1095, core/replay_memory.py:214-215)
silently never ran: every "collision-filtered" BC run trained on
unfiltered data.
"""

import jax.numpy as jnp
import numpy as np

from gaddpg_tpu import replay
from gaddpg_tpu.envs.assets import box_asset
from gaddpg_tpu.train.config import load_config
from gaddpg_tpu.train.loop import Trainer


def test_bc_policy_implies_supervised_collection():
    cfg = load_config(policy="BC")
    assert cfg.rl is False
    # explicit override still wins
    cfg = load_config(overrides={"RL": True}, policy="BC")
    assert cfg.rl is True
    # DDPG stays RL
    assert load_config(policy="DDPG").rl is True


class _FakeWorker:
    """Synthetic rollout: 4 envs x 3 steps with known outcome flags."""

    T = 3
    N = 4

    def rollout(self, agent_state, key, explore, noise):
        n, t = self.N, self.T
        npts = 1024 + 6  # must match the buffer's (4, uniform_num_pts+6)
        episodes = {
            "point_state": jnp.zeros((n, t, 4, npts)),
            "action": jnp.zeros((n, t, 6)),
            "expert_action": jnp.zeros((n, t, 6)),
            "reward": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1)),
            "terminal": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1)),
            "timestep": jnp.tile(jnp.arange(t, dtype=jnp.float32), (n, 1)),
            "state_pose": jnp.tile(jnp.eye(4), (n, t, 1, 1)),
            "goal": jnp.zeros((n, t, 7)),
            "expert_flags": jnp.ones((n, t)),
            "perturb_flags": jnp.zeros((n, t)),
            "collide": jnp.zeros((n, t)),
            "grasp": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1)),
            "target_idx": jnp.zeros((n, t)),
        }
        valid = jnp.ones((n, t), bool)
        # env 0: success, clean   env 1: success, collided
        # env 2: failure, clean   env 3: failure, collided
        rewards = jnp.array([1.0, 1.0, 0.0, 0.0])
        episodes["reward"] = rewards[:, None] * episodes["terminal"]
        stats = {
            "success": rewards,
            "explore_env": jnp.zeros((n,), bool),
            "valid_scene": jnp.ones((n,)),
            "episode_len": jnp.full((n,), t),
            "collided": jnp.array([False, True, False, True]),
        }
        return episodes, valid, rewards, stats


def _collect_filled(**overrides):
    cfg = load_config(overrides={
        "num_envs": _FakeWorker.N, "batch_size": 4, "buffer_size": 64,
        "output_dir": "output/test_filters",
        **overrides,
    }, policy="BC")
    tr = Trainer(cfg, lib=box_asset(0.06, 0.06, 0.14))
    tr.worker = _FakeWorker()
    tr.collect()
    return int(replay.upper_idx(tr.buffer)), tr


def test_success_filter_default_bc():
    # default BC: keep successful episodes (envs 0, 1) -> 2 x 3 steps
    filled, _ = _collect_filled()
    assert filled == 2 * _FakeWorker.T


def test_demo_collision_filter_drops_collided():
    # success AND collision-free: env 0 only
    filled, tr = _collect_filled(demo_collision_filter=True)
    assert filled == 1 * _FakeWorker.T
    assert float(np.asarray(tr.buffer.collide[:filled]).max()) == 0.0


def test_dagger_success_filter_drops_failures():
    filled, _ = _collect_filled(dagger_success_filter=True)
    assert filled == 2 * _FakeWorker.T
