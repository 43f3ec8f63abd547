"""BC learning demo: expert data -> BC updates -> scene-set evaluation.

Sized for slow hosts: run with a wall-clock budget and it checkpoints +
evaluates whatever it reached.

    JAX_PLATFORMS=cpu BUDGET_MIN=90 python examples/train_bc_demo.py
"""

import json
import os
import time

import jax
import numpy as np

from gaddpg_tpu.envs.assets import box_asset, build_library, AssetSpec
from gaddpg_tpu.envs.scenes import generate_scenes, save_scenes
from gaddpg_tpu.train.checkpoints import save_agent
from gaddpg_tpu.train.config import load_config
from gaddpg_tpu.train.loop import Trainer


def main():
    budget_s = float(os.environ.get("BUDGET_MIN", 60)) * 60
    out = os.environ.get("OUT", "output/bc_demo")
    cfg = load_config(overrides={
        "num_envs": int(os.environ.get("ENVS", 16)),
        "batch_size": int(os.environ.get("BATCH", 64)),
        "updates_per_iter": 4,
        "explore_ratio": 0.0,
        "dart": False,
        "dagger": False,
        "max_epoch": 100000,
        "output_dir": out,
    }, policy="BC")
    lib = build_library([
        AssetSpec("demo_box", "box", (0.05, 0.05, 0.12), 0.2),
        AssetSpec("demo_cyl", "cylinder", (0.03, 0.12), 0.25),
    ])
    tr = Trainer(cfg, lib=lib)
    t_start = time.time()

    # fixed eval scenes
    scenes = generate_scenes(tr.env, jax.random.PRNGKey(123), cfg.num_envs * 2)
    save_scenes(scenes, os.path.join(out, "eval_scenes.npz"))

    base_rate, _ = tr.evaluate(episodes=2, scenes=scenes)
    print(f"[baseline] untrained policy success: {base_rate:.3f}", flush=True)

    # expert data collection
    waves = int(os.environ.get("WAVES", 6))
    for w in range(waves):
        stats = tr.collect()
        print(f"[collect {w}] {stats}", flush=True)

    # training until budget
    i = 0
    while time.time() - t_start < budget_s:
        m = tr.train_iter()
        i += 1
        if m and i % 5 == 0:
            print(f"[train {tr.update_step}] "
                  f"bc={m.get('bc_loss', 0):.4f} "
                  f"aux={m.get('policy_grasp_aux_loss', 0):.4f} "
                  f"({(time.time()-t_start)/60:.0f} min)", flush=True)
            tr.metrics.log(tr.update_step, m)
        if i % 20 == 0:
            save_agent(tr.agent_state, out)
    save_agent(tr.agent_state, out)

    rate, perf = tr.evaluate(episodes=2, scenes=scenes)
    print(f"[final] updates={tr.update_step} success={rate:.3f} "
          f"(baseline {base_rate:.3f})", flush=True)
    print(perf.table(), flush=True)
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump({"baseline": base_rate, "trained": rate,
                   "updates": tr.update_step}, f)


if __name__ == "__main__":
    main()
