"""Diagnose eval-mode collapse: are the checkpoint's BN running stats
consistent with its train-mode behavior?

Loads a checkpoint, runs the policy feature+head forward in BOTH
train=True (batch stats) and train=False (running stats) on the same
random point batch, and prints action-mean divergence + BN stat
magnitudes. A large train/eval gap indicts the running-stat update path
(the round-4 fused-SA surrogate), not the learning itself.

    JAX_PLATFORMS=cpu CKPT=output/bc_proc_r4 COL_AUX=0.5 python \
        experiments/scripts/diag_bn.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gaddpg_tpu.agents.config import AgentConfig  # noqa: E402
from gaddpg_tpu.agents.ddpg import extract_feature  # noqa: E402
from gaddpg_tpu.agents.state import create_agent_state, make_modules  # noqa: E402
from gaddpg_tpu.train.checkpoints import load_agent  # noqa: E402

CKPT = os.environ.get("CKPT", "output/bc_proc_r4")
COL_AUX = float(os.environ.get("COL_AUX", 0.5))


def main():
    cfg = AgentConfig(collision_aux_weight=COL_AUX)
    state = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=1030)
    loaded = load_agent(state, CKPT)
    assert loaded is not None, CKPT
    state = loaded
    feat, policy, critic, goal = make_modules(cfg)

    key = jax.random.PRNGKey(1)
    ps = jax.random.normal(key, (32, 4, 1030)) * 0.05
    ps = ps.at[:, 3, :].set(0.0).at[:, 3, :6].set(1.0)
    tvec = jnp.full((32,), 10.0)

    f_eval, _ = extract_feature(
        feat, state.feat_params, state.feat_stats, ps, tvec,
        value=False, train=False, use_time=cfg.use_time)
    f_train, _ = extract_feature(
        feat, state.feat_params, state.feat_stats, ps, tvec,
        value=False, train=True, use_time=cfg.use_time)
    a_eval = policy.apply({"params": state.policy_params}, f_eval)
    a_train = policy.apply({"params": state.policy_params}, f_train)
    m_eval = np.asarray(a_eval[0])
    m_train = np.asarray(a_train[0])
    print("feat eval  norm/std:", float(jnp.linalg.norm(f_eval)),
          float(f_eval.std()))
    print("feat train norm/std:", float(jnp.linalg.norm(f_train)),
          float(f_train.std()))
    print("action mean (eval) :", m_eval.mean(0)[:6], "std", m_eval.std())
    print("action mean (train):", m_train.mean(0)[:6], "std", m_train.std())
    print("|eval-train| action:", np.abs(m_eval - m_train).mean())

    # BN running-stat magnitudes per collection
    def stat_summary(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, (dict,)) or hasattr(v, "items"):
                stat_summary(v, prefix + k + "/")
            else:
                v = np.asarray(v)
                print(f"  {prefix + k:60s} mean|x|={np.abs(v).mean():.4g} "
                      f"max|x|={np.abs(v).max():.4g}")

    print("feat_stats (policy encoder):")
    stat_summary(
        state.feat_stats["encoder"]
        if "encoder" in state.feat_stats else state.feat_stats)


if __name__ == "__main__":
    main()
