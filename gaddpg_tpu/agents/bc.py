"""Behavior-cloning agent update (reference: core/bc.py:11-56).

The policy phase of DDPG without the critic: PM BC loss on expert
transitions + grasp-auxiliary PM loss, stepping policy and encoder.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from gaddpg_tpu.agents.config import AgentConfig
from gaddpg_tpu.agents.losses import collision_bce, goal_pred_loss, pose_bc_loss
from gaddpg_tpu.agents.state import AgentState, make_modules, make_optimizers
from gaddpg_tpu.agents.ddpg import extract_feature, _masks


def make_bc_update(cfg: AgentConfig):
    feat, policy, _, _ = make_modules(cfg)
    txs = make_optimizers(cfg)

    obs_key = "image_state" if cfg.use_image else "point_state"

    def update(state: AgentState, batch: Dict[str, Any], key) -> Tuple[AgentState, Dict]:
        m = _masks(batch)

        def loss_fn(policy_params, feat_params):
            policy_feat, stats = extract_feature(
                feat, feat_params, state.feat_stats,
                batch[obs_key], batch["time"],
                value=False, train=True, use_time=cfg.use_time,
            )
            mean, _, aux_pred = policy.apply({"params": policy_params}, policy_feat)
            pi = jnp.tanh(mean) * jnp.asarray(policy.action_high)
            # collision-discounted imitation: expert transitions whose
            # episode suffix carries a collision flag teach the very
            # contacts the policy must avoid -- down-weight them
            w_expert = m["expert"].astype(jnp.float32)
            if cfg.collision_demo_discount > 0:
                w_expert = w_expert * (
                    1.0 - cfg.collision_demo_discount * batch["collide_future"]
                )
            bc = pose_bc_loss(pi, batch["expert_action"], w_expert)
            aux_l = 0.0
            if cfg.policy_aux:
                aux_l = goal_pred_loss(
                    aux_pred[:, :7], batch["goal"][:, :7], m["goal_reward"]
                )
            col_l = 0.0
            if cfg.collision_aux_weight > 0:
                col_l = cfg.collision_aux_weight * collision_bce(
                    aux_pred[:, -1], batch["collide_future"]
                )
            return bc + aux_l + col_l, (stats, bc, aux_l, col_l)

        (p_grads, f_grads), (stats, bc_v, aux_v, col_v) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.policy_params, state.feat_params)

        p_updates, policy_opt = txs["policy"].update(
            p_grads, state.policy_opt, state.policy_params
        )
        policy_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.policy_params, p_updates
        )
        feat_params = dict(state.feat_params)
        enc_updates, enc_opt = txs["encoder"].update(
            f_grads["encoder"], state.feat_opt["encoder"], feat_params["encoder"]
        )
        if cfg.train_feature:
            feat_params["encoder"] = jax.tree_util.tree_map(
                lambda p, u: p + u, feat_params["encoder"], enc_updates
            )

        new_state = state.replace(
            feat_params=feat_params,
            feat_stats=stats,
            policy_params=policy_params,
            policy_opt=policy_opt,
            feat_opt={**state.feat_opt, "encoder": enc_opt},
            update_step=state.update_step + 1,
        )
        metrics = {
            "bc_loss": bc_v,
            "policy_grasp_aux_loss": aux_v,
            "collision_aux_loss": col_v,
            "expert_mask_num": m["expert"].sum(),
        }
        return new_state, metrics

    return update


def bc_update(cfg: AgentConfig):
    return jax.jit(make_bc_update(cfg), donate_argnums=(0,))
