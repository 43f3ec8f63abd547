"""The fused online training loop.

Orchestrates what the reference spreads over 5 Ray actor types
(reference: core/train_online.py:357-574, core/trainer.py): rollout
program -> on-device replay insert -> K jitted agent updates, with
explore/noise schedules keyed on the update step. Single process; the
only host work is schedule arithmetic and logging.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaddpg_tpu import replay
from gaddpg_tpu.agents.bc import make_bc_update
from gaddpg_tpu.agents.ddpg import make_ddpg_update
from gaddpg_tpu.agents.state import create_agent_state
from gaddpg_tpu.envs.assets import library_from_index
from gaddpg_tpu.envs.grasp_env import PandaGraspEnv
from gaddpg_tpu.train.checkpoints import load_agent, save_agent
from gaddpg_tpu.train.config import TrainConfig
from gaddpg_tpu.train.metrics import MetricLogger, ObjectPerformance
from gaddpg_tpu.train.rollout import RolloutWorker
from gaddpg_tpu.train.schedules import explore_schedule, noise_schedule


class Trainer:
    def __init__(self, cfg: TrainConfig, lib=None, env=None, mesh=None):
        """`mesh`: a 1-D `jax.sharding.Mesh` ("dp" axis) shards the FULL
        train iteration data-parallel -- env batch (rollout physics +
        render), replay buffers (capacity axis), and the update (batch
        axis, params replicated, gradient all-reduce over ICI). The
        TPU-native form of the reference's 4-GPU scaling recipe
        (2 rollout + 2 training GPUs, batch x2 worker x2 --
        reference: experiments/config.py:5-11,
        core/train_online.py:415-432)."""
        from gaddpg_tpu.parallel.mesh import (
            make_sharded_update, replicate, shard_leading_axis,
            validate_dp_divisibility,
        )

        self.cfg = cfg
        self.mesh = mesh
        # fail fast on shapes that cannot shard evenly (round-2 verdict
        # item 6: the dryrun always picked divisible shapes, so a bad
        # num_envs died deep inside GSPMD instead of here)
        validate_dp_divisibility(
            mesh,
            num_envs=cfg.num_envs,
            batch_size=cfg.batch_size,
            buffer_size=cfg.buffer_size,
        )
        self.lib = lib if lib is not None else library_from_index(
            cfg.index_file, cfg.index_split
        )
        self.env = env if env is not None else PandaGraspEnv(cfg.env, self.lib)
        self.worker = RolloutWorker(self.env, cfg.agent, cfg, mesh=mesh)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, k_init = jax.random.split(key)
        num_pts = cfg.env.uniform_num_pts + 6
        self.agent_state = create_agent_state(k_init, cfg.agent, npoints=num_pts)

        update_fn = (make_bc_update if cfg.policy == "BC"
                     else make_ddpg_update)(cfg.agent)
        if mesh is not None:
            self.agent_state = replicate(mesh, self.agent_state)
            self.update = make_sharded_update(update_fn, mesh)
        else:
            self.update = jax.jit(update_fn, donate_argnums=(0,))

        img_shape = None
        if cfg.agent.use_image:
            cam = self.env.p.camera
            img_shape = (5, cam.height, cam.width)
        self.buffer = replay.create_buffer(
            cfg.buffer_size, num_points=num_pts, image_shape=img_shape
        )
        self.online_buffer = None
        if cfg.onpolicy and cfg.online_buffer_size:
            self.online_buffer = replay.create_buffer(
                cfg.online_buffer_size, num_points=num_pts, image_shape=img_shape
            )
        if mesh is not None:
            # replay shards on the capacity axis: inserts land on the
            # shard owning the write window, samples gather across it
            self.buffer = shard_leading_axis(mesh, self.buffer)
            if self.online_buffer is not None:
                self.online_buffer = shard_leading_axis(mesh, self.online_buffer)

        self.metrics = MetricLogger(cfg.output_dir)
        self.obj_perf = ObjectPerformance(self.lib.names)
        self._add = jax.jit(replay.add_episodes, static_argnames=("gamma",))

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    @property
    def update_step(self) -> int:
        return int(self.agent_state.update_step)

    # ------------------------------------------------------------------
    def collect(self):
        """One rollout wave across all envs; insert episodes into replay."""
        cfg = self.cfg
        explore = explore_schedule(self.update_step, cfg)
        noise = noise_schedule(self.update_step, cfg)
        episodes, valid, rewards, stats = self.worker.rollout(
            self.agent_state, self._next_key(),
            jnp.asarray(explore), jnp.asarray(noise),
        )
        # BC keeps only successful expert demos
        # (reference: core/replay_memory.py:214-215)
        if not cfg.rl:
            keep = (rewards > 0.5) | stats["explore_env"]
            if cfg.dagger_success_filter:
                # success-filtered DAgger: explore waves only aggregate
                # when the relabeled episode actually succeeds -- failed
                # on-policy trajectories dilute the demo set at
                # mesh-scale demo budgets (round-2 proc_policy.md)
                keep = rewards > 0.5
            if cfg.demo_collision_filter:
                keep = keep & ~stats["collided"]
            valid = valid & keep[:, None]
        target = self.buffer
        if self.online_buffer is not None:
            exp_valid = valid & ~stats["explore_env"][:, None]
            on_valid = valid & stats["explore_env"][:, None]
            self.buffer = self._add(self.buffer, episodes, exp_valid,
                                    gamma=cfg.agent.gamma)
            self.online_buffer = self._add(self.online_buffer, episodes, on_valid,
                                           gamma=cfg.agent.gamma)
        else:
            self.buffer = self._add(target, episodes, valid, gamma=cfg.agent.gamma)

        self.obj_perf.update(
            np.asarray(episodes["target_idx"][:, 0]),
            np.asarray(rewards),
            np.asarray(stats["valid_scene"]),
        )
        return {
            "rollout_success": float(jnp.sum(stats["success"]))
            / max(float(jnp.sum(stats["valid_scene"])), 1.0),
            "explore_frac": float(explore),
            "valid_scene_frac": float(jnp.mean(stats["valid_scene"])),
            "collide_frac": float(
                jnp.sum(stats["collided"] & (stats["valid_scene"] > 0))
            ) / max(float(jnp.sum(stats["valid_scene"])), 1.0),
            "buffer_idx": int(self.buffer.cur_idx),
            "env_steps": int(self.buffer.total_env_step),
        }

    # ------------------------------------------------------------------
    def train_iter(self):
        """K agent updates from the replay
        (reference: core/trainer.py:202-293).

        With an on-policy buffer, each update batch mixes
        int(batch_size * online_buffer_ratio) of the agent's own rollouts
        into the expert batch (reference: core/trainer.py:214-225).
        """
        cfg = self.cfg
        if int(replay.upper_idx(self.buffer)) < cfg.batch_size:
            return {}
        n_on = 0
        if self.online_buffer is not None and cfg.online_buffer_ratio > 0:
            n_on = int(cfg.batch_size * cfg.online_buffer_ratio)
            if int(replay.upper_idx(self.online_buffer)) < n_on:
                n_on = 0
        ep_len = min(cfg.max_steps, 8)
        last = {}
        for _ in range(cfg.updates_per_iter):
            batch = replay.sample(
                self.buffer, self._next_key(), cfg.batch_size,
                episode_max_len=ep_len,
                onpolicy_goal=cfg.self_supervision,
            )
            if n_on:
                on = replay.sample(
                    self.online_buffer, self._next_key(), n_on,
                    episode_max_len=ep_len,
                    onpolicy_goal=cfg.self_supervision,
                )
                batch = {
                    k: jnp.concatenate([batch[k], on[k]], axis=0) for k in batch
                }
            self.agent_state, metrics = self.update(
                self.agent_state, batch, self._next_key()
            )
            last = metrics
        return {k: float(v) for k, v in last.items()}

    # ------------------------------------------------------------------
    def run(self, max_iters=None, log_every=None):
        """Full online loop (reference: core/train_online.py:531-574)."""
        cfg = self.cfg
        log_every = log_every or cfg.log_interval
        it = 0
        while self.update_step < cfg.max_epoch:
            it += 1
            t0 = time.time()
            roll_stats = self.collect()
            t_roll = time.time() - t0
            t0 = time.time()
            train_stats = self.train_iter()
            t_train = time.time() - t0

            if it % log_every == 0:
                scalars = dict(roll_stats)
                scalars.update(train_stats)
                scalars.update(
                    rollout_time=t_roll, train_time=t_train,
                    update_step=self.update_step,
                )
                self.metrics.log(self.update_step, scalars)
            if self.update_step and self.update_step % cfg.save_interval == 0:
                save_agent(self.agent_state, cfg.output_dir)
            if max_iters and it >= max_iters:
                break
        save_agent(self.agent_state, cfg.output_dir)
        return self.obj_perf

    # ------------------------------------------------------------------
    def evaluate(self, episodes: int = 1, scenes=None, expert: bool = False):
        """Policy (or expert-baseline) evaluation waves; returns success.

        With `scenes` (a scene set dict from envs.scenes) the protocol is
        deterministic: wave w evaluates scenes [w*num_envs, ...) with
        wraparound, mirroring the reference's fixed scene_{k} loop.
        """
        from gaddpg_tpu.envs.scenes import scene_slice

        total, ok = 0, 0
        perf = ObjectPerformance(self.lib.names)
        for w in range(episodes):
            if scenes is not None:
                batch = scene_slice(scenes, w * self.cfg.num_envs, self.cfg.num_envs)
                out = self.worker.evaluate_scenes(
                    self.agent_state, batch, self._next_key(), expert=expert
                )
            else:
                out = self.worker.evaluate(
                    self.agent_state, self._next_key(), expert=expert
                )
            v = np.asarray(out["valid_scene"])
            r = np.asarray(out["success"])
            perf.update(np.asarray(out["obj_idx"]), r, v)
            total += int(v.sum())
            ok += int((r[v > 0] > 0.5).sum())
        return ok / max(total, 1), perf
