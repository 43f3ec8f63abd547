"""DDPG/TD3 jitted update step and action selection.

Functional re-design of the reference learner
(reference: core/ddpg.py:146-185, core/agent.py:127-240):

- critic phase: twin smooth-L1 Bellman error on non-perturbed samples
  (DART steps excluded, reference: core/ddpg.py:125-126) + critic
  grasp-aux PM loss; grads step the critic AND the value encoder.
- policy phase: PM behavior cloning on expert steps * (1 - mix ratio),
  policy grasp-aux PM loss, and a delayed deterministic actor-critic
  term -mix * min(Q1, Q2) on non-expert-success samples
  (reference: core/ddpg.py:164-177); grads step the policy AND encoder.
- targets: policy target full polyak(tau); critic target half-soft (Q1
  polyak each step) / half-hard (Q2 copied every
  `target_update_interval`) (reference: core/utils.py:757-774).

Deviation from the reference (documented): the reference's uniform
target-smoothing noise `(rand*3 - 6) * scale` is biased (always
negative; reference: core/utils.py:575); we use the symmetric
`(rand*6 - 3) * scale` which is the standard TD3 form.
"""

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from gaddpg_tpu.agents.config import AgentConfig
from gaddpg_tpu.agents.losses import (
    collision_bce, goal_pred_loss, pose_bc_loss, smooth_l1,
)
from gaddpg_tpu.agents.state import AgentState, make_modules, make_optimizers


def _valid_index(arr, idx):
    a = jnp.asarray(arr)
    return a[jnp.minimum(idx, len(a) - 1)]


def _sched_index(step, milestones):
    return jnp.sum(step > jnp.asarray(milestones))


def mix_ratios(cfg: AgentConfig, step):
    """(mix_value_ratio, mix_policy_ratio) schedule
    (reference: core/ddpg.py:108-117)."""
    idx = _sched_index(step, cfg.mix_milestones)
    mp = jnp.minimum(_valid_index(cfg.mix_policy_ratio_list, idx), cfg.mix_policy_ratio_cap)
    mv = jnp.minimum(_valid_index(cfg.mix_value_ratio_list, idx), cfg.mix_value_ratio_cap)
    return mv, mp


def exploration_noise(key, action, noise_scale, noise_type: str = "uniform"):
    """Symmetric exploration/smoothing noise; rotation dims x5
    (reference: core/utils.py:568-584, made symmetric -- see module doc)."""
    if noise_type == "uniform":
        n = (jax.random.uniform(key, action.shape) * 6.0 - 3.0) * noise_scale
    else:
        n = jax.random.normal(key, action.shape) * noise_scale / 2.0
    return n.at[..., 3:].multiply(5.0)


def extract_feature(
    feat_module,
    feat_params,
    feat_stats,
    point_state,
    time_batch,
    action=None,
    value: bool = False,
    train: bool = True,
    use_time: bool = True,
):
    """Encoder forward; returns (feature [B, 512(+1)], new_stats)."""
    variables = {"params": feat_params, "batch_stats": feat_stats}
    if train:
        out, mut = feat_module.apply(
            variables, point_state, action=action, value=value, train=True,
            mutable=["batch_stats"],
        )
        new_stats = mut["batch_stats"]
    else:
        out = feat_module.apply(
            variables, point_state, action=action, value=value, train=False
        )
        new_stats = feat_stats
    if use_time:
        out = jnp.concatenate([out, time_batch[:, None].astype(out.dtype)], axis=-1)
    return out, new_stats


def _masks(batch):
    """Training masks (reference: core/agent.py:224-237)."""
    reward_mask = batch["return"] > 0
    expert_mask = batch["expert_flags"] >= 1
    return {
        "reward": reward_mask,
        "expert": expert_mask,
        "expert_reward": reward_mask & expert_mask,
        "not_perturb": batch["perturb_flags"] < 1,
        "goal_reward": reward_mask,
    }


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _soft_update(target, source, tau):
    return jax.tree_util.tree_map(
        lambda t, s: t * (1.0 - tau) + s * tau, target, source
    )


def _critic_target_update(target, source, tau, hard):
    """Q1 polyak every step; Q2 hard-copied when `hard`; aux head frozen
    (reference: core/utils.py:757-770)."""

    def upd(path, t, s):
        name = str(path[0].key)
        if name.startswith("q1"):
            return t * (1.0 - tau) + s * tau
        if name.startswith("q2"):
            return jnp.where(hard, s, t)
        return t

    return jax.tree_util.tree_map_with_path(upd, target, source)


def make_ddpg_update(cfg: AgentConfig):
    """Build the jitted `update(state, batch, key) -> (state, metrics)`."""
    feat, policy, critic, _ = make_modules(cfg)
    txs = make_optimizers(cfg)

    # image mode trains on the RGBDM state instead of the point cloud
    # (reference: core/agent.py:63-70 image_state branch)
    obs_key = "image_state" if cfg.use_image else "point_state"
    next_obs_key = "next_" + obs_key

    def update(state: AgentState, batch: Dict[str, Any], key) -> Tuple[AgentState, Dict]:
        m = _masks(batch)
        mix_value_ratio, mix_policy_ratio = mix_ratios(cfg, state.update_step)
        noise_idx = _sched_index(state.update_step, cfg.mix_milestones)
        noise_scale = cfg.action_noise * _valid_index(cfg.noise_ratio_list, noise_idx)
        k_noise, _ = jax.random.split(key)

        # ---------------- critic phase ----------------
        def critic_loss_fn(critic_params, feat_params):
            value_feat, stats1 = extract_feature(
                feat, feat_params, state.feat_stats,
                batch[obs_key], batch["time"],
                action=batch["action"], value=True, train=True,
                use_time=cfg.use_time,
            )
            qf1, qf2, critic_aux = critic.apply({"params": critic_params}, value_feat)

            # target value, no grad (reference: core/ddpg.py:61-88)
            next_time = batch["time"] - 1.0
            next_feat, _ = extract_feature(
                feat, jax.lax.stop_gradient(feat_params), state.feat_stats,
                batch[next_obs_key], next_time,
                value=False, train=True, use_time=cfg.use_time,
            )
            next_mean, _, _ = policy.apply({"params": state.policy_target}, next_feat)
            next_action = jnp.tanh(next_mean) * jnp.asarray(policy.action_high)
            nd = exploration_noise(k_noise, next_action, noise_scale, cfg.noise_type)
            nd = nd.at[:, :3].set(jnp.clip(nd[:, :3], -0.01, 0.01))
            next_action = next_action + nd
            next_vfeat, _ = extract_feature(
                feat, jax.lax.stop_gradient(feat_params), state.feat_stats,
                batch[next_obs_key], next_time,
                action=next_action, value=True, train=True, use_time=cfg.use_time,
            )
            q1t, q2t, _ = critic.apply({"params": state.critic_target}, next_vfeat)
            min_q = jnp.minimum(q1t[:, 0], q2t[:, 0])
            next_q = batch["reward"] + (1.0 - batch["terminal"]) * cfg.gamma * min_q
            next_q = jax.lax.stop_gradient(next_q)

            critic_loss = smooth_l1(qf1[:, 0], next_q, m["not_perturb"]) + smooth_l1(
                qf2[:, 0], next_q, m["not_perturb"]
            )
            aux_loss = 0.0
            if cfg.critic_aux:
                aux_loss = goal_pred_loss(
                    critic_aux[:, :7], batch["goal"][:, :7], m["goal_reward"]
                )
            total = critic_loss + aux_loss
            return total, (stats1, critic_loss, aux_loss, qf1.mean())

        (c_grads, f_grads), aux = jax.grad(critic_loss_fn, argnums=(0, 1), has_aux=True)(
            state.critic_params, state.feat_params
        )
        stats1, critic_loss_v, critic_aux_v, q_mean = aux

        c_updates, critic_opt = txs["critic"].update(
            c_grads, state.critic_opt, state.critic_params
        )
        critic_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.critic_params, c_updates
        )
        venc_updates, venc_opt = txs["value_encoder"].update(
            f_grads["value_encoder"],
            state.feat_opt["value_encoder"],
            state.feat_params["value_encoder"],
        )
        feat_params = dict(state.feat_params)
        if cfg.train_value_feature:
            feat_params["value_encoder"] = jax.tree_util.tree_map(
                lambda p, u: p + u, state.feat_params["value_encoder"], venc_updates
            )

        # ---------------- policy phase ----------------
        apply_ac = (state.update_step % cfg.policy_update_gap) == 0

        def policy_loss_fn(policy_params, feat_params_):
            policy_feat, stats2 = extract_feature(
                feat, feat_params_, stats1,
                batch[obs_key], batch["time"],
                value=False, train=True, use_time=cfg.use_time,
            )
            mean, _, aux_pred = policy.apply({"params": policy_params}, policy_feat)
            pi = jnp.tanh(mean) * jnp.asarray(policy.action_high)

            # collision-discounted imitation (see agents/bc.py): expert
            # transitions committed to a later robot-obstacle contact
            # are down-weighted
            w_expert = m["expert"].astype(jnp.float32)
            if cfg.collision_demo_discount > 0:
                w_expert = w_expert * (
                    1.0 - cfg.collision_demo_discount * batch["collide_future"]
                )
            bc = pose_bc_loss(pi, batch["expert_action"], w_expert) * (
                1.0 - mix_policy_ratio
            )
            aux_l = 0.0
            if cfg.policy_aux:
                aux_l = goal_pred_loss(
                    aux_pred[:, :7], batch["goal"][:, :7], m["goal_reward"]
                )
            if cfg.collision_aux_weight > 0:
                aux_l = aux_l + cfg.collision_aux_weight * collision_bce(
                    aux_pred[:, -1], batch["collide_future"]
                )
            # delayed deterministic actor-critic term
            vfeat_pi, _ = extract_feature(
                feat, jax.lax.stop_gradient(feat_params_), stats1,
                batch[obs_key], batch["time"],
                action=pi, value=True, train=True, use_time=cfg.use_time,
            )
            q1p, q2p, _ = critic.apply({"params": critic_params}, vfeat_pi)
            min_qp = jnp.minimum(q1p[:, 0], q2p[:, 0])
            not_es = ~m["expert_reward"]
            denom = jnp.maximum(not_es.sum(), 1)
            ac = -mix_policy_ratio * jnp.sum(min_qp * not_es) / denom
            ac = jnp.where(apply_ac, ac, 0.0)
            total = bc + aux_l + ac
            return total, (stats2, bc, aux_l, ac)

        (p_grads, f_grads2), aux2 = jax.grad(policy_loss_fn, argnums=(0, 1), has_aux=True)(
            state.policy_params, feat_params
        )
        stats2, bc_v, paux_v, ac_v = aux2

        p_updates, policy_opt = txs["policy"].update(
            p_grads, state.policy_opt, state.policy_params
        )
        policy_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.policy_params, p_updates
        )
        enc_updates, enc_opt = txs["encoder"].update(
            f_grads2["encoder"], state.feat_opt["encoder"], feat_params["encoder"]
        )
        if cfg.train_feature:
            feat_params["encoder"] = jax.tree_util.tree_map(
                lambda p, u: p + u, feat_params["encoder"], enc_updates
            )

        # ---------------- target updates ----------------
        step = state.update_step + 1
        policy_target = _soft_update(state.policy_target, policy_params, cfg.tau)
        hard = (step % cfg.target_update_interval) == 0
        critic_target = _critic_target_update(
            state.critic_target, critic_params, cfg.tau, hard
        )

        new_state = state.replace(
            feat_params=feat_params,
            feat_stats=stats2,
            policy_params=policy_params,
            critic_params=critic_params,
            policy_target=policy_target,
            critic_target=critic_target,
            policy_opt=policy_opt,
            critic_opt=critic_opt,
            feat_opt={"encoder": enc_opt, "value_encoder": venc_opt},
            update_step=step,
        )
        metrics = {
            "critic_loss": critic_loss_v,
            "critic_grasp_aux_loss": critic_aux_v,
            "bc_loss": bc_v,
            "policy_grasp_aux_loss": paux_v,
            "actor_critic_loss": ac_v,
            "q_mean": q_mean,
            "reward_mask_num": m["reward"].sum(),
            "expert_mask_num": m["expert"].sum(),
            "mix_policy_ratio": mix_policy_ratio,
            "mix_value_ratio": mix_value_ratio,
        }
        return new_state, metrics

    return update


def ddpg_update(cfg: AgentConfig):
    """Convenience: jitted update builder."""
    return jax.jit(make_ddpg_update(cfg), donate_argnums=(0,))


def make_select_action(cfg: AgentConfig):
    """Build jittable `select_action(state, point_state, time, key, noise_scale,
    explore) -> (action, aux_pred)` (reference: core/agent.py:82-125)."""
    feat, policy, _, _ = make_modules(cfg)

    def select_action(state: AgentState, point_state, remain_time, key,
                      noise_scale=0.0, explore=False):
        feature, _ = extract_feature(
            feat, state.feat_params, state.feat_stats,
            point_state, remain_time, value=False, train=False,
            use_time=cfg.use_time,
        )
        mean, _, aux = policy.apply({"params": state.policy_params}, feature)
        action = jnp.tanh(mean) * jnp.asarray(policy.action_high)
        noise = exploration_noise(key, action, cfg.action_noise * noise_scale,
                                  cfg.noise_type)
        action = jnp.where(explore, action + noise, action)
        return action, aux

    return select_action


select_action = make_select_action  # alias for the public API
