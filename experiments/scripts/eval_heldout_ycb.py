"""Held-out YCB TEST-split evaluation (VERDICT round-1 item 2a).

The reference's test protocol evaluates the ycb_large.json "test" split
(the train objects minus 019_pitcher_base -- see
reference: experiments/object_index/ycb_large.json) on pre-generated
scenes the policy never trained on
(reference: experiments/scripts/test_ycb.sh:18-21,
core/train_test_offline.py:176-302). This script builds 200 FRESH fixed
scenes (seed disjoint from the training-eval scene set) on the test
split and scores expert vs the flagship BC+DAgger checkpoint,
200 scenes x 3 runs.

    JAX_PLATFORMS=cpu python experiments/scripts/eval_heldout_ycb.py
Env knobs: CKPT (output/bc_long_r3), OUT, ENVS, RUNS, NUM_SCENES.
"""

import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401  (CPU override, see _platform.py)

from gaddpg_tpu.envs.assets import library_from_index  # noqa: E402
from gaddpg_tpu.envs.scenes import generate_scenes, load_scenes, save_scenes  # noqa: E402
from gaddpg_tpu.train.checkpoints import load_agent  # noqa: E402
from gaddpg_tpu.train.config import load_config  # noqa: E402
from gaddpg_tpu.train.loop import Trainer  # noqa: E402

CKPT = os.environ.get("CKPT", "output/bc_long_r3")
OUT = os.environ.get("OUT", "output/heldout_ycb")
ENVS = int(os.environ.get("ENVS", 25))
RUNS = int(os.environ.get("RUNS", 3))
NUM_SCENES = int(os.environ.get("NUM_SCENES", 200))


def eval_policy(tr, scenes, n_scenes, runs, expert=False, label=""):
    waves = -(-n_scenes // tr.cfg.num_envs)
    rates, perf = [], None
    for run in range(runs):
        t0 = time.time()
        rate, perf = tr.evaluate(episodes=waves, scenes=scenes, expert=expert)
        rates.append(rate)
        print(f"[{label} run {run}] success={rate:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    return float(np.mean(rates)), float(np.std(rates)), perf


def main():
    os.makedirs(OUT, exist_ok=True)
    cfg = load_config(overrides={
        "num_envs": ENVS, "index_file": "ycb", "index_split": "test",
        "output_dir": OUT,
    }, policy="BC")
    lib = library_from_index("ycb", "test")
    if os.environ.get("VERIFY_GRASPS", "1") == "1":
        from gaddpg_tpu.envs.assets import verify_library_grasps
        lib = verify_library_grasps(lib)
    tr = Trainer(cfg, lib=lib)

    scene_path = os.path.join(OUT, "eval_scenes.npz")
    if os.path.exists(scene_path):
        scenes = load_scenes(scene_path)
    else:
        print(f"generating {NUM_SCENES} held-out eval scenes...", flush=True)
        scenes = generate_scenes(tr.env, jax.random.PRNGKey(20260817), NUM_SCENES)
        save_scenes(scenes, scene_path)
    n_scenes = len(np.asarray(scenes["obj_idx"]))

    # load BEFORE the expensive expert arm: a wrong CKPT path must fail
    # fast, not after three expert runs (round-2 advisor item 2)
    loaded = load_agent(tr.agent_state, CKPT)
    assert loaded is not None, f"no checkpoint under {CKPT}"

    results = {}
    results["expert"] = eval_policy(
        tr, scenes, n_scenes, RUNS, expert=True, label="expert")
    tr.agent_state = loaded
    results["bc"] = eval_policy(tr, scenes, n_scenes, RUNS, label="bc")

    lines = [
        "# Held-out YCB test-split evaluation",
        "",
        f"Protocol: {n_scenes} fixed pre-generated scenes x {RUNS} runs on the",
        "ycb_large.json TEST split (9 objects; the reference's split is the",
        "train set minus 019_pitcher_base -- reference:",
        "experiments/object_index/ycb_large.json,",
        "experiments/scripts/test_ycb.sh:18-21). Scene seed disjoint from the",
        "training-run eval scenes; the BC+DAgger checkpoint never saw these",
        f"scenes (checkpoint: {CKPT}).",
        "",
        "Command:",
        "```",
        "JAX_PLATFORMS=cpu python experiments/scripts/eval_heldout_ycb.py",
        "```",
        "",
        "| policy | success (mean ± std) |",
        "|---|---|",
    ]
    for k in ("expert", "bc"):
        mu, sd, _ = results[k]
        lines.append(f"| {k} | {mu:.3f} ± {sd:.3f} |")
    _, _, bc_perf = results["bc"]
    lines += ["", "Per-object BC success (final run):", "```",
              bc_perf.table(), "```", ""]
    path = "experiments/results/heldout_ycb.md"
    with open(path, "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(OUT, "results.json"), "w") as f:
        json.dump({k: v[:2] for k, v in results.items()}, f)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
