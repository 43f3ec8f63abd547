"""On-policy buffer mixing (reference: core/trainer.py:214-225) and the
fused online loop smoke."""

import numpy as np
import jax.numpy as jnp

from gaddpg_tpu import replay
from gaddpg_tpu.envs.assets import box_asset
from gaddpg_tpu.train.config import load_config
from gaddpg_tpu.train.loop import Trainer


def _fill(buf, n_eps, T=10, flag=1.0):
    for i in range(n_eps):
        ep = {
            "point_state": jnp.ones((T, 4, 1030)) * flag,
            "action": jnp.zeros((T, 6)),
            "expert_action": jnp.zeros((T, 6)),
            "reward": jnp.zeros((T,)).at[T - 1].set(1.0),
            "terminal": jnp.zeros((T,)).at[T - 1].set(1.0),
            "timestep": jnp.arange(T, dtype=jnp.float32),
            "state_pose": jnp.tile(jnp.eye(4), (T, 1, 1)),
            "goal": jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0.1]), (T, 1)),
            "expert_flags": jnp.full((T,), flag),
            "perturb_flags": jnp.zeros((T,)),
            "collide": jnp.zeros((T,)),
            "grasp": jnp.zeros((T,)),
            "target_idx": jnp.zeros((T,)),
        }
        buf = replay.add_episode(buf, ep, jnp.ones((T,), bool))
    return buf


class TestOnlineMixing:
    def test_train_iter_mixes_online_batch(self):
        cfg = load_config(overrides={
            "num_envs": 2, "batch_size": 16, "updates_per_iter": 1,
            "onpolicy": True, "online_buffer_size": 512,
            "online_buffer_ratio": 0.5, "buffer_size": 512,
            "output_dir": "output/test_mix",
        }, policy="DDPG")
        assert cfg.online_buffer_ratio == 0.5
        tr = Trainer(cfg, lib=box_asset(0.05, 0.05, 0.12))
        num_pts = cfg.env.uniform_num_pts + 6
        tr.buffer = _fill(
            replay.create_buffer(512, num_points=num_pts), 4, flag=1.0)
        tr.online_buffer = _fill(
            replay.create_buffer(512, num_points=num_pts), 2, flag=0.0)

        metrics = tr.train_iter()
        assert metrics, "no update ran"
        assert np.isfinite(metrics["critic_loss"])
        # batch = 16 expert + 8 online transitions: the expert-mask count
        # proves both buffers contributed (expert flag 1 vs 0)
        assert metrics["expert_mask_num"] == 16
        assert tr.update_step == 1

    def test_no_mixing_when_online_buffer_starved(self):
        cfg = load_config(overrides={
            "num_envs": 2, "batch_size": 16, "updates_per_iter": 1,
            "onpolicy": True, "online_buffer_size": 512,
            "online_buffer_ratio": 0.5, "buffer_size": 512,
            "output_dir": "output/test_mix2",
        }, policy="DDPG")
        tr = Trainer(cfg, lib=box_asset(0.05, 0.05, 0.12))
        num_pts = cfg.env.uniform_num_pts + 6
        tr.buffer = _fill(
            replay.create_buffer(512, num_points=num_pts), 4, flag=1.0)
        # online buffer empty -> pure expert batch, still trains
        metrics = tr.train_iter()
        assert metrics and np.isfinite(metrics["critic_loss"])
        assert metrics["expert_mask_num"] == 16
