"""Fixed-scene protocol evaluation for ANY saved agent checkpoint.

Same protocol as eval_bc_long.py (the reference's test_ycb.sh: fixed
pre-generated scenes, lift success, multi-run mean +- std; reference:
experiments/scripts/test_ycb.sh:18-21, core/train_test_offline.py:
176-302) without re-running the untrained/expert/BC arms — for quick
A/Bs of new checkpoints against the RESULTS.md numbers.

    CKPT=output/ddpg_scratch python experiments/scripts/eval_ckpt_fixed.py
Env knobs: CKPT (required), SCENES (output/bc_long_r3/eval_scenes.npz),
RUNS (2), ENVS (25).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

from gaddpg_tpu.envs.assets import library_from_index, verify_library_grasps  # noqa: E402
from gaddpg_tpu.envs.scenes import load_scenes  # noqa: E402
from gaddpg_tpu.train.checkpoints import load_agent  # noqa: E402
from gaddpg_tpu.train.config import load_config  # noqa: E402
from gaddpg_tpu.train.loop import Trainer  # noqa: E402

CKPT = os.environ["CKPT"]
SCENES = os.environ.get("SCENES", "output/bc_long_r3/eval_scenes.npz")
RUNS = int(os.environ.get("RUNS", 2))
ENVS = int(os.environ.get("ENVS", 25))


def main():
    scenes = load_scenes(SCENES)
    n_scenes = len(np.asarray(scenes["obj_idx"]))
    cfg = load_config(overrides={
        "num_envs": ENVS, "index_file": "ycb", "output_dir": CKPT,
        # must match the checkpoint's arch-affecting knobs (a nonzero
        # collision_aux_weight widens the policy aux head; image mode
        # swaps the trunk): see agents/state.py
        "collision_aux_weight": float(os.environ.get("COL_AUX", 0.0)),
        "use_image": os.environ.get("USE_IMAGE", "0") == "1",
        "IMG_SIZE": int(os.environ.get("IMG", 64)),
    }, policy="DDPG")
    lib = verify_library_grasps(library_from_index("ycb", "train"))
    tr = Trainer(cfg, lib=lib)
    loaded = load_agent(tr.agent_state, CKPT)
    assert loaded is not None, f"no checkpoint under {CKPT}"
    tr.agent_state = loaded

    waves = -(-n_scenes // ENVS)
    if os.environ.get("EXPERT", "0") == "1":
        t0 = time.time()
        rate, _ = tr.evaluate(episodes=waves, scenes=scenes, expert=True)
        print(f"RESULT expert: {rate:.3f} over {n_scenes} fixed scenes "
              f"({time.time()-t0:.0f}s)", flush=True)
    rates = []
    for run in range(RUNS):
        t0 = time.time()
        rate, _ = tr.evaluate(episodes=waves, scenes=scenes)
        rates.append(rate)
        print(f"[{CKPT} run {run}] success={rate:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    print(f"RESULT {CKPT}: {np.mean(rates):.3f} +- {np.std(rates):.3f} "
          f"over {n_scenes} fixed scenes x {RUNS} runs", flush=True)


if __name__ == "__main__":
    main()
