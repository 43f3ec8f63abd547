"""Single-BC-update A/B on REAL demo data: fused-SA train path vs XLA.

The round-4 empirical result: identical data + config, only
GADDPG_PALLAS_SA differing, gives proc-mesh policy success 0.101
(fused) vs 0.562 (XLA). Checkpoint BN running stats are sane in both,
so the corruption is in the learned params. This script takes ONE
update step from the same initial state through both paths on the
current device and prints loss, grad-norm, and per-tree param-delta
divergence -- localizing whether single-step gradients already differ.

    python experiments/scripts/diag_update_ab.py          # device
    STEPS=20 python experiments/scripts/diag_update_ab.py # drift probe
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

import jax  # noqa: E402
import numpy as np  # noqa: E402

from gaddpg_tpu.agents.bc import make_bc_update  # noqa: E402
from gaddpg_tpu.agents.config import AgentConfig  # noqa: E402
from gaddpg_tpu.agents.state import create_agent_state  # noqa: E402
from gaddpg_tpu.replay.npz_io import load_npz  # noqa: E402
from gaddpg_tpu import replay  # noqa: E402

DATA = os.environ.get("DATA", "output/bc_proc_r4b/bc_demos.npz")
BATCH = int(os.environ.get("BATCH", 64))
STEPS = int(os.environ.get("STEPS", 1))
COL_AUX = float(os.environ.get("COL_AUX", 0.5))


def tree_delta(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    out = []
    for path, leaf in la:
        d = np.abs(np.asarray(leaf) - np.asarray(lb[path]))
        ref = np.abs(np.asarray(leaf)).mean() + 1e-12
        out.append((jax.tree_util.keystr(path), d.max(), d.mean() / ref))
    return out


def run(mode, state0, batches, cfg):
    os.environ["GADDPG_PALLAS_SA_TRAIN"] = mode
    upd = jax.jit(make_bc_update(cfg))
    state = state0
    losses = []
    for i in range(STEPS):
        state, m = upd(state, batches[i], jax.random.PRNGKey(100 + i))
        losses.append(float(m["bc_loss"]))
    return state, losses


def main():
    cfg = AgentConfig(collision_aux_weight=COL_AUX)
    state0 = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=1030)
    buf = load_npz(DATA, buffer_size=40000, num_points=1030)
    print(f"loaded {int(buf.filled)} transitions", flush=True)
    batches = []
    for i in range(STEPS):
        batches.append(replay.sample(buf, jax.random.PRNGKey(7000 + i),
                                     BATCH, episode_max_len=8))

    s_xla, l_xla = run("0", state0, batches, cfg)
    print("xla losses   :", " ".join(f"{x:.5f}" for x in l_xla), flush=True)
    s_fused, l_fused = run("1", state0, batches, cfg)
    print("fused losses :", " ".join(f"{x:.5f}" for x in l_fused), flush=True)

    print("-- param deltas (policy encoder params, fused vs xla) --")
    for name, dmax, drel in tree_delta(s_fused.feat_params,
                                       s_xla.feat_params)[:40]:
        flag = " <<<" if drel > 1e-2 else ""
        print(f"  {name:70s} max|d|={dmax:.3e} rel={drel:.3e}{flag}")
    print("-- batch_stats deltas --")
    for name, dmax, drel in tree_delta(s_fused.feat_stats,
                                       s_xla.feat_stats):
        flag = " <<<" if drel > 1e-2 else ""
        print(f"  {name:70s} max|d|={dmax:.3e} rel={drel:.3e}{flag}")


if __name__ == "__main__":
    main()
