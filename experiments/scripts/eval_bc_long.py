"""Fixed-scene evaluation -> RESULTS.md success artifact.

The reference protocol: ~200 pre-generated scenes x 3 runs, lift
success, per-object table, mean +- std
(reference: experiments/scripts/test_ycb.sh:18-21,
core/train_test_offline.py:176-302). Evaluates untrained / BC / expert
on the scene set saved by train_bc_long.py and writes RESULTS.md.

    JAX_PLATFORMS=cpu python experiments/scripts/eval_bc_long.py
"""

import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gaddpg_tpu.envs.assets import library_from_index  # noqa: E402
from gaddpg_tpu.envs.scenes import load_scenes  # noqa: E402
from gaddpg_tpu.train.checkpoints import load_agent  # noqa: E402
from gaddpg_tpu.train.config import load_config  # noqa: E402
from gaddpg_tpu.train.loop import Trainer  # noqa: E402

OUT = os.environ.get("OUT", "output/bc_long")
RUNS = int(os.environ.get("RUNS", 3))
ENVS = int(os.environ.get("ENVS", 25))


def eval_policy(tr, scenes, n_scenes, runs, expert=False, label=""):
    waves = -(-n_scenes // tr.cfg.num_envs)
    rates, tables = [], None
    for run in range(runs):
        t0 = time.time()
        rate, perf = tr.evaluate(episodes=waves, scenes=scenes, expert=expert)
        rates.append(rate)
        tables = perf  # per-object counts accumulate within the run only
        print(f"[{label} run {run}] success={rate:.3f} ({time.time()-t0:.0f}s)",
              flush=True)
    return float(np.mean(rates)), float(np.std(rates)), tables


def main():
    scenes = load_scenes(os.path.join(OUT, "eval_scenes.npz"))
    n_scenes = len(np.asarray(scenes["obj_idx"]))
    cfg = load_config(overrides={
        "num_envs": ENVS, "index_file": "ycb", "output_dir": OUT,
    }, policy="BC")
    lib = library_from_index("ycb", "train")
    if os.environ.get("VERIFY_GRASPS", "1") == "1":
        from gaddpg_tpu.envs.assets import verify_library_grasps
        lib = verify_library_grasps(lib)  # physics-verified grasp DB

    tr = Trainer(cfg, lib=lib)

    # load BEFORE the expert arm: a wrong OUT path must fail fast, not
    # after the expensive expert runs (round-2 advisor item 2)
    loaded = load_agent(tr.agent_state, OUT)
    assert loaded is not None, f"no checkpoint under {OUT}"

    results = {}
    results["untrained"] = eval_policy(
        tr, scenes, n_scenes, 1, label="untrained")
    results["expert"] = eval_policy(
        tr, scenes, n_scenes, RUNS, expert=True, label="expert")
    tr.agent_state = loaded
    results["bc"] = eval_policy(tr, scenes, n_scenes, RUNS, label="bc")
    if os.environ.get("TIME_AB", "1") == "1":
        # deployment remaining-time convention A/B (max_steps - t instead
        # of the expert-plan-length countdown; VERDICT weak item 7)
        import dataclasses

        from gaddpg_tpu.train.rollout import RolloutWorker

        # fresh worker: the jitted eval closes over cfg at trace time
        saved_cfg, saved_worker = tr.cfg, tr.worker
        tr.cfg = dataclasses.replace(tr.cfg, eval_time_mode="steps")
        tr.worker = RolloutWorker(tr.env, tr.cfg.agent, tr.cfg)
        results["bc (steps-clock)"] = eval_policy(
            tr, scenes, n_scenes, 1, label="bc-steps-clock")
        tr.cfg, tr.worker = saved_cfg, saved_worker

    stats = {}
    sp = os.path.join(OUT, "train_stats.json")
    if os.path.exists(sp):
        stats = json.load(open(sp))

    lines = [
        "# RESULTS — learned-policy success (round 3)",
        "",
        f"Protocol: {n_scenes} fixed pre-generated scenes x {RUNS} runs,",
        "success = lift > 8 cm held after retract (the reference's",
        "test_ycb.sh protocol, reference: experiments/scripts/test_ycb.sh:18-21,",
        "core/train_test_offline.py:176-302). YCB proxy library, train split.",
        "",
        "Command:",
        "```",
        "JAX_PLATFORMS=cpu python experiments/scripts/train_bc_long.py",
        "JAX_PLATFORMS=cpu python experiments/scripts/eval_bc_long.py",
        "```",
        "",
        "| policy | success (mean ± std) |",
        "|---|---|",
    ]
    for k in [k for k in ("untrained", "expert", "bc", "bc (steps-clock)") if k in results]:
        mu, sd, _ = results[k]
        lines.append(f"| {k} | {mu:.3f} ± {sd:.3f} |")
    if stats:
        lines += [
            "",
            f"BC training: {stats.get('updates', '?')} updates on "
            f"{stats.get('n_data', '?')} expert transitions; bc_loss "
            f"{stats.get('loss_first25', float('nan')):.4f} -> "
            f"{stats.get('loss_last25', float('nan')):.4f}.",
        ]
    _, _, bc_perf = results["bc"]
    lines += ["", "Per-object BC success (final run):", "```",
              bc_perf.table(), "```", ""]
    with open("RESULTS.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
