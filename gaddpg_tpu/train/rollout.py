"""Vectorized episode rollout: N envs, one episode each, one XLA program.

Functional analogue of `ActorWrapper.rollout`
(reference: core/train_online.py:207-321):

- a fraction of envs "explore" (roll the policy + noise), the rest roll
  the servo expert (the reference's explore/expert episode split);
- explore envs may start with a few expert steps (expert_initial_state)
  and get DAgger expert-relabel steps; expert envs get DART random
  perturbation steps flagged perturb (excluded from the critic loss);
- envs freeze once done; after the scan every env runs the retract
  macro and the lift reward lands on its last valid transition with the
  discounted-return backfill done at buffer insert.

All branching is per-env masked selects -- no Python control flow on
traced values.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gaddpg_tpu.agents.ddpg import make_select_action
from gaddpg_tpu.envs.grasp_env import PandaGraspEnv
from gaddpg_tpu.parallel.mesh import constrain_leading_axis


def _tree_where(pred, a, b):
    """Select pytrees with a per-env boolean (pred broadcast per leaf)."""
    def sel(x, y):
        shape = (pred.shape[0],) + (1,) * (x.ndim - 1)
        return jnp.where(pred.reshape(shape), x, y)

    return jax.tree_util.tree_map(sel, a, b)


class RolloutWorker:
    """Bundles env + policy selection into jitted rollout programs."""

    def __init__(self, env: PandaGraspEnv, agent_cfg, train_cfg, mesh=None):
        self.env = env
        self.cfg = train_cfg
        self.agent_cfg = agent_cfg
        self.select_action = make_select_action(agent_cfg)
        # image mode: the policy consumes the RGBDM observation and the
        # replay stores it (reference: experiments/config.py:105)
        self.use_image = agent_cfg.use_image
        # data-parallel mesh: the env batch shards on the `dp` axis --
        # the whole rollout (reset, physics, render, policy forward)
        # partitions across devices via GSPMD, the TPU-native form of
        # the reference's N rollout workers scaling axis
        # (reference: core/train_online.py:131-155, experiments/config.py:5-11)
        self.mesh = mesh
        self.rollout = jax.jit(self._rollout, static_argnames=("expert_only",))
        self.evaluate = jax.jit(self._evaluate, static_argnames=("expert",))
        self.evaluate_scenes = jax.jit(
            self._evaluate_scenes, static_argnames=("expert",)
        )

    # ------------------------------------------------------------------
    def _reset_all(self, key, num_envs):
        keys = constrain_leading_axis(
            self.mesh, jax.random.split(key, num_envs)
        )
        states, obs = jax.vmap(self.env.reset)(keys)
        return (
            constrain_leading_axis(self.mesh, states),
            constrain_leading_axis(self.mesh, obs),
        )

    # ------------------------------------------------------------------
    def _rollout(self, agent_state, key, explore_frac, noise_scale,
                 expert_only: bool = False):
        """Returns (episodes (N,T,...), valid (N,T), rewards (N,), stats).

        `expert_only=True` compiles out the policy forward pass -- the
        expert data-generation workflow (bc_save_data) never reads it.
        """
        cfg = self.cfg
        env = self.env
        n = cfg.num_envs
        T = cfg.rollout_horizon

        k_reset, k_flags, k_scan, k_retract = jax.random.split(key, 4)
        states, obs = self._reset_all(k_reset, n)
        valid_scene = states.valid_scene

        kf1, kf2 = jax.random.split(k_flags)
        explore_env = jax.random.uniform(kf1, (n,)) < explore_frac
        expert_init_steps = jax.random.randint(
            kf2, (n,), cfg.expert_init_min_step, max(cfg.expert_init_max_step, 1)
        )
        use_expert_init = cfg.expert_initial_state and cfg.policy != "BC"
        plan_len = jax.vmap(env.expert_steps)(states)

        def step_fn(carry, t):
            states, obs, done, key = carry
            # extra k_step subkey: deriving the env step keys from the
            # carried key would alias them with next iteration's k1..k5
            # (threefry splits are prefix-consistent across counts)
            key, k1, k2, k3, k4, k5, k_step = jax.random.split(key, 7)

            t_f = t.astype(jnp.float32)
            # the reference caps DAgger at expert_traj_length-8 with fixed
            # 20-step OMG plans; our servo plan lengths are distance-based
            # (often ~10), so cap relative to the actual plan instead
            dagger = (
                jnp.asarray(cfg.dagger)
                & explore_env
                & (t_f > cfg.dagger_min_step)
                & (t_f < jnp.minimum(cfg.dagger_max_step, plan_len + 2.0))
                & (jax.random.uniform(k2, (n,)) < cfg.dagger_ratio)
            )
            if cfg.dagger and env.p.use_planner:
                # trajectory-optimizer expert: DAgger relabels replan from
                # the policy's current state (reference replans with the
                # remaining steps, core/train_online.py:246-251)
                replanned = jax.vmap(env.replan)(states)
                states = _tree_where(dagger & ~done, replanned, states)

            expert_a = jax.vmap(env.expert_action)(states)
            remain = jnp.maximum(plan_len - t.astype(plan_len.dtype), 1.0)
            if expert_only:
                policy_a = expert_a
            else:
                inp = obs.image if self.use_image else obs.point_state
                policy_a, _ = self.select_action(
                    agent_state, inp, remain, k1, noise_scale, True
                )
            dart = (
                jnp.asarray(cfg.dart)
                & ~explore_env
                & (t_f > cfg.dart_min_step)
                & (t_f < cfg.dart_max_step)
                & (jax.random.uniform(k3, (n,)) < cfg.dart_ratio)
            )
            expert_now = (
                ~explore_env
                | (jnp.asarray(use_expert_init) & (t < expert_init_steps))
                | dagger
            )
            action = jnp.where(expert_now[:, None], expert_a, policy_a)
            # DART perturbation (reference: env/panda_scene.py:1069-1076)
            perturb_a = jnp.concatenate(
                [
                    jax.random.uniform(k4, (n, 3), minval=-0.04, maxval=0.04),
                    jax.random.uniform(k5, (n, 3), minval=-0.2, maxval=0.2),
                ],
                axis=-1,
            )
            action = jnp.where(dart[:, None], perturb_a, action)

            step_keys = jax.random.split(k_step, n)
            new_states, new_obs, _, new_done, info = env.step_batched(
                states, action, step_keys,
                requery_goal=explore_env & ~dagger,
            )
            # expert episodes end when the plan does (+slack: the servo
            # tracks a distance heuristic, not an exact trajectory, and
            # the reference extends past plan end too,
            # reference: core/train_online.py:286 EXTEND_MAX_STEP)
            new_done = new_done | (~explore_env & (t_f >= plan_len + 3.0))

            # freeze finished envs
            keep = ~done
            states = _tree_where(keep, new_states, states)
            obs_next = _tree_where(keep, new_obs, obs)

            expert_flag = jnp.where(
                dagger, 2.0, (~explore_env).astype(jnp.float32)
            )
            trans = {
                "point_state": obs.point_state,
                **({"image_state": obs.image} if self.use_image else {}),
                "action": action,
                "expert_action": expert_a,
                "reward": jnp.zeros((n,)),
                "terminal": jnp.zeros((n,)),
                "timestep": jnp.full((n,), t_f),
                "state_pose": obs.ef_pose,
                "goal": obs.goal_pose,
                "expert_flags": expert_flag,
                "perturb_flags": dart.astype(jnp.float32),
                "collide": info["collided"].astype(jnp.float32),
                "grasp": jnp.zeros((n,)),
                "target_idx": states.obj_idx.astype(jnp.float32),
            }
            done_out = done | new_done
            return (states, obs_next, done_out, key), (trans, keep)

        done0 = jnp.zeros((n,), bool)
        (states, obs, done, _), (episodes, valid) = jax.lax.scan(
            step_fn, (states, obs, done0, k_scan), jnp.arange(T)
        )
        # (T, N, ...) -> (N, T, ...); episodes shard on the env axis so
        # the replay insert that consumes them stays device-local
        episodes = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), episodes)
        episodes = constrain_leading_axis(self.mesh, episodes)
        valid = jnp.swapaxes(valid, 0, 1)
        valid = valid & valid_scene[:, None]

        # retract + lift reward on the last valid transition
        retract_keys = jax.random.split(k_retract, n)
        _, rewards = env.retract_batched(states, retract_keys)
        n_valid = jnp.sum(valid, axis=1)
        is_last = jnp.arange(T)[None, :] == (n_valid - 1)[:, None]
        episodes["reward"] = is_last * rewards[:, None]
        episodes["terminal"] = is_last.astype(jnp.float32)
        episodes["grasp"] = is_last.astype(jnp.float32)

        stats = {
            "success": rewards * valid_scene,
            "explore_env": explore_env,
            "valid_scene": valid_scene,
            "episode_len": n_valid,
            # robot-obstacle/object contact during the episode (feeds
            # the collision-aware demo filters and the collide_frac log,
            # reference: env/panda_scene.py:1078-1095)
            "collided": states.collided_before,
        }
        return episodes, valid, rewards, stats

    # ------------------------------------------------------------------
    def _evaluate(self, agent_state, key, expert: bool = False):
        """Policy (or expert) evaluation on freshly randomized scenes."""
        k_reset, k_run = jax.random.split(key)
        states, obs = self._reset_all(k_reset, self.cfg.num_envs)
        return self._eval_from(agent_state, states, obs, k_run, expert=expert)

    def _evaluate_scenes(self, agent_state, scenes, key, expert: bool = False):
        """Policy (or expert, for the A/B baseline the reference's
        --expert flag provides, reference: core/train_test_offline.py:208-223)
        evaluation on a fixed scene set (reproducible protocol,
        reference: core/train_test_offline.py:176-256)."""
        k_reset, k_run = jax.random.split(key)
        keys = jax.random.split(k_reset, self.cfg.num_envs)
        scenes = constrain_leading_axis(self.mesh, scenes)
        keys = constrain_leading_axis(self.mesh, keys)
        states, obs = jax.vmap(self.env.reset_scene)(scenes, keys)
        return self._eval_from(agent_state, states, obs, k_run, expert=expert)

    def _eval_from(self, agent_state, states, obs, key, expert: bool = False):
        cfg = self.cfg
        env = self.env
        n = cfg.num_envs
        T = cfg.rollout_horizon

        k_scan, k_retract = jax.random.split(key)
        valid_scene = states.valid_scene
        if cfg.eval_time_mode == "steps":
            # deployment convention: episode step budget countdown
            plan_len = jnp.full((n,), float(cfg.max_steps))
        else:
            plan_len = jax.vmap(env.expert_steps)(states)

        def step_fn(carry, t):
            states, obs, done, key = carry
            key, k1, k_step = jax.random.split(key, 3)
            remain = jnp.maximum(plan_len - t.astype(plan_len.dtype), 1.0)
            if expert:
                action = jax.vmap(env.expert_action)(states)
            else:
                inp = obs.image if self.use_image else obs.point_state
                action, _ = self.select_action(
                    agent_state, inp, remain, k1, 0.0, False
                )
            step_keys = jax.random.split(k_step, n)
            new_states, new_obs, _, new_done, _ = env.step_batched(
                states, action, step_keys
            )
            keep = ~done
            states = _tree_where(keep, new_states, states)
            obs = _tree_where(keep, new_obs, obs)
            return (states, obs, done | new_done, key), None

        (states, _, _, _), _ = jax.lax.scan(
            step_fn, (states, obs, jnp.zeros((n,), bool), k_scan), jnp.arange(T)
        )
        retract_keys = jax.random.split(k_retract, n)
        _, rewards = env.retract_batched(states, retract_keys)
        return {
            "success": rewards,
            "valid_scene": valid_scene,
            "obj_idx": states.obj_idx,
            # robot-obstacle/object contact during the episode (the
            # reference logs collision alongside success,
            # reference: core/train_test_offline.py:258-302)
            "collided": states.collided_before,
        }
