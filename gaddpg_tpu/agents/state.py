"""AgentState pytree + optimizer construction.

One flat dataclass holds every learnable/optimizer tensor, replacing the
reference's per-module checkpoint objects (reference: core/agent.py:282-346).
Target networks exist only for the policy/critic heads, matching the
reference where the feature extractor has no target copy
(reference: core/ddpg.py:69-88 runs the online extractor under no_grad).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from gaddpg_tpu.agents.config import AgentConfig
from gaddpg_tpu.models import (
    GaussianPolicy,
    GoalFeature,
    ImageFeature,
    PointNetFeature,
    QNetwork,
)


@struct.dataclass
class AgentState:
    feat_params: Any
    feat_stats: Any
    policy_params: Any
    critic_params: Any
    goal_params: Any
    goal_stats: Any
    policy_target: Any
    critic_target: Any
    policy_opt: Any
    critic_opt: Any
    feat_opt: Any
    goal_opt: Any
    update_step: jnp.ndarray  # scalar int32


def multistep_lr(base_lr: float, milestones, gamma: float):
    """torch MultiStepLR as an optax schedule."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones}
    )


def make_modules(cfg: AgentConfig):
    import jax.numpy as jnp

    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    feat = ImageFeature() if cfg.use_image else PointNetFeature(dtype=dt)
    # the optional collision-prediction logit rides as the LAST dim of
    # the policy aux head (consumers index aux[..., :7] for the goal and
    # aux[..., -1] for the collision logit)
    policy = GaussianPolicy(
        action_dim=cfg.action_dim,
        hidden=cfg.hidden_size,
        extra_pred_dim=(7 if cfg.policy_aux else 1)
        + (1 if cfg.collision_aux_weight > 0 else 0),
    )
    critic = QNetwork(hidden=cfg.hidden_size, extra_pred_dim=7 if cfg.critic_aux else 0)
    goal = GoalFeature()
    return feat, policy, critic, goal


def make_optimizers(cfg: AgentConfig) -> Dict[str, optax.GradientTransformation]:
    """Adam(eps=1e-5, wd=1e-5) + MultiStepLR, mirroring
    (reference: core/utils.py:960-1006, experiments/model_spec/*.yaml)."""

    def adamw(lr, milestones, gamma, clip=None):
        tx = optax.adamw(
            multistep_lr(lr, milestones, gamma),
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        )
        if clip is not None:
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
        return tx

    # The reference keeps *separate* Adam optimizers for the policy
    # encoder and the value encoder, stepped by different losses
    # (reference: core/utils.py:221-234, core/agent.py:196-203,
    # core/ddpg.py:136-143). We mirror that with two transforms applied
    # to the matching top-level subtrees of feat_params.
    return {
        "policy": adamw(cfg.lr, cfg.policy_milestones, cfg.lr_gamma),
        # critic grads are clipped by norm (reference: core/ddpg.py:141)
        "critic": adamw(cfg.value_lr, cfg.value_milestones, cfg.value_lr_gamma,
                        clip=cfg.clip_grad),
        "encoder": adamw(cfg.feature_lr, cfg.feature_milestones, cfg.feature_lr_gamma),
        "value_encoder": adamw(
            cfg.feature_lr, cfg.feature_milestones, cfg.feature_lr_gamma
        ),
        "goal": adamw(cfg.feature_lr, cfg.feature_milestones, cfg.feature_lr_gamma),
    }


def _read_state_dict(path: str):
    """Torchvision checkpoint from disk: torch .pth pickle or .npz with
    the same key names."""
    if path.endswith(".npz"):
        import numpy as np

        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu")
    return sd.get("state_dict", sd)


def create_agent_state(key, cfg: AgentConfig, npoints: int = 1030) -> AgentState:
    feat, policy, critic, goal = make_modules(cfg)
    txs = make_optimizers(cfg)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    if cfg.use_image:
        s = cfg.image_size
        pc = jnp.zeros((1, 5, s, s))
    else:
        pc = jnp.zeros((1, 4, npoints))
    feat_vars = feat.init(k1, pc, train=False)
    # also trace the value path so value_encoder params exist
    feat_vars_v = feat.init(
        k1, pc, action=jnp.zeros((1, cfg.action_dim)), value=True, train=False
    )
    feat_params = FrozenDict(
        {**feat_vars_v["params"].unfreeze(), **feat_vars["params"].unfreeze()}
        if hasattr(feat_vars["params"], "unfreeze")
        else {**feat_vars_v["params"], **feat_vars["params"]}
    )
    feat_stats = FrozenDict(
        {**feat_vars_v["batch_stats"].unfreeze(), **feat_vars["batch_stats"].unfreeze()}
        if hasattr(feat_vars["batch_stats"], "unfreeze")
        else {**feat_vars_v["batch_stats"], **feat_vars["batch_stats"]}
    )

    if cfg.use_image and cfg.pretrained_resnet:
        from gaddpg_tpu.models.resnet import load_pretrained_encoders

        p, s = load_pretrained_encoders(
            feat_params, feat_stats, _read_state_dict(cfg.pretrained_resnet)
        )
        feat_params, feat_stats = FrozenDict(p), FrozenDict(s)

    state_feat = jnp.zeros((1, cfg.num_inputs))
    policy_params = policy.init(k2, state_feat)["params"]
    # image mode appends the action to the value feature (see
    # ImageFeature), so the critic input is wider
    critic_in = cfg.num_inputs + (cfg.action_dim if cfg.use_image else 0)
    critic_params = critic.init(k3, jnp.zeros((1, critic_in)))["params"]
    goal_vars = goal.init(k4, jnp.zeros((1, 512, 3)), train=False)

    return AgentState(
        feat_params=feat_params,
        feat_stats=feat_stats,
        policy_params=policy_params,
        critic_params=critic_params,
        goal_params=goal_vars["params"],
        goal_stats=goal_vars["batch_stats"],
        policy_target=jax.tree_util.tree_map(jnp.copy, policy_params),
        critic_target=jax.tree_util.tree_map(jnp.copy, critic_params),
        policy_opt=txs["policy"].init(policy_params),
        critic_opt=txs["critic"].init(critic_params),
        feat_opt={
            "encoder": txs["encoder"].init(feat_params["encoder"]),
            "value_encoder": txs["value_encoder"].init(feat_params["value_encoder"]),
        },
        goal_opt=txs["goal"].init(goal_vars["params"]),
        update_step=jnp.asarray(0, jnp.int32),
    )
