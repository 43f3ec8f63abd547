"""Generic policy-vs-expert evaluation on any library/clutter config.

Round-4 artifacts (VERDICT items 2b/2c): learned success in dynamic
clutter against the expert baseline, and learned success on the
procedural mesh library's held-out split. Random-scene waves, the same
protocol as experiments/results/clutter_eval.md
(reference eval loop: core/train_test_offline.py:176-302).

    JAX_PLATFORMS=cpu CKPT=output/bc_clutter CLUTTER=2 WAVES=6 \
        python experiments/scripts/eval_policy.py
Env knobs: INDEX (ycb), SPLIT (train), CLUTTER (0), CKPT, WAVES (6),
ENVS (24), OUT (stdout tag), EXPERT (1 = also run expert baseline).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

from gaddpg_tpu.envs.assets import library_from_index  # noqa: E402
from gaddpg_tpu.train.checkpoints import load_agent  # noqa: E402
from gaddpg_tpu.train.config import load_config  # noqa: E402
from gaddpg_tpu.train.loop import Trainer  # noqa: E402

INDEX = os.environ.get("INDEX", "ycb")
SPLIT = os.environ.get("SPLIT", "train")
CLUTTER = int(os.environ.get("CLUTTER", 0))
CKPT = os.environ.get("CKPT", "")
WAVES = int(os.environ.get("WAVES", 6))
ENVS = int(os.environ.get("ENVS", 24))
SEED = int(os.environ.get("SEED", 3))  # vary for independent repeats
OUT = os.environ.get("OUT", "")
EXPERT = os.environ.get("EXPERT", "1") == "1"
# must match the checkpoint's training config: a nonzero
# collision_aux_weight adds a collision logit to the policy aux head
# (agents/state.py), changing the param shapes load_agent restores
COL_AUX = float(os.environ.get("COL_AUX", 0.0))
# image-mode checkpoints swap the point trunk for the ResNet RGBDM
# branch (same contract as eval_ckpt_fixed.py)
USE_IMAGE = os.environ.get("USE_IMAGE", "0") == "1"
IMG = int(os.environ.get("IMG", 64))


def run_eval(tr, expert, label):
    total, ok, collided = 0, 0, 0
    t0 = time.time()
    for w in range(WAVES):
        out = tr.worker.evaluate(tr.agent_state, tr._next_key(), expert=expert)
        v = np.asarray(out["valid_scene"]) > 0
        r = np.asarray(out["success"])[v]
        total += int(v.sum())
        ok += int((r > 0.5).sum())
        if "collided" in out:
            collided += int(np.asarray(out["collided"])[v].sum())
        print(f"[{label}] wave {w}: {ok}/{total}", flush=True)
    rate = ok / max(total, 1)
    print(f"[{label}] success={rate:.3f} collided={collided}/{total} "
          f"({total} valid episodes, {time.time()-t0:.0f}s)", flush=True)
    return rate, total, collided


def main():
    cfg = load_config(overrides={
        "num_envs": ENVS, "index_file": INDEX, "index_split": SPLIT,
        "num_clutter": CLUTTER, "output_dir": OUT or "output/eval_tmp",
        "RNG_SEED": SEED,
        "collision_aux_weight": COL_AUX,
        "use_image": USE_IMAGE,
        "IMG_SIZE": IMG,
    }, policy="BC")
    lib = library_from_index(INDEX, SPLIT)
    if os.environ.get("VERIFY_GRASPS", "1") == "1":
        from gaddpg_tpu.envs.assets import verify_library_grasps
        lib = verify_library_grasps(lib)
    tr = Trainer(cfg, lib=lib)

    # load BEFORE the expert arm: a wrong CKPT path must fail fast, not
    # after the expensive expert runs (round-2 advisor item 2)
    loaded = None
    if CKPT:
        loaded = load_agent(tr.agent_state, CKPT)
        assert loaded is not None, f"no checkpoint under {CKPT}"

    results = {}
    if EXPERT:
        results["expert"] = run_eval(tr, True, "expert")
    if CKPT:
        tr.agent_state = loaded
        results["policy"] = run_eval(tr, False, f"policy:{CKPT}")
    for k, (rate, total, coll) in results.items():
        print(f"RESULT {k}: {rate:.3f} over {total} episodes "
              f"(collisions {coll}) index={INDEX}/{SPLIT} clutter={CLUTTER}")


if __name__ == "__main__":
    main()
