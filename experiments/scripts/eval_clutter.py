"""Expert success in cluttered scenes with DYNAMIC obstacle physics.

The round-3 centerpiece artifact: scenes hold 1 target + K simulated
obstacle bodies (physics/multi.py); the CHOMP expert must plan around
them, and robot-obstacle contact is a physical event. Reports lift
success and the collision rate, the clutter analogues of the
reference's multi-object PlanningScene workflow
(reference: env/panda_scene.py:881-1035).

    JAX_PLATFORMS=cpu python experiments/scripts/eval_clutter.py
Env knobs: WAVES (6), ENVS (24), CLUTTER (2), OUT.
"""

import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gaddpg_tpu.train.config import load_config  # noqa: E402
from gaddpg_tpu.train.loop import Trainer  # noqa: E402

WAVES = int(os.environ.get("WAVES", 6))
ENVS = int(os.environ.get("ENVS", 24))
CLUTTER = int(os.environ.get("CLUTTER", 2))
OUT = os.environ.get("OUT", "output/clutter_eval.md")


def main():
    t0 = time.time()
    cfg = load_config(
        "experiments/cfgs/td3_clutter.yaml",
        overrides={"num_remotes": ENVS, "num_clutter": CLUTTER},
    )
    tr = Trainer(cfg)
    if os.environ.get("VERIFY_GRASPS", "1") == "1":
        from gaddpg_tpu.envs.assets import verify_library_grasps

        tr.env.lib = tr.lib = verify_library_grasps(tr.lib)

    total, ok, collided, valid = 0, 0, 0, 0
    for w in range(WAVES):
        out = tr.worker.evaluate(tr.agent_state, tr._next_key(), expert=True)
        v = np.asarray(out["valid_scene"]) > 0
        r = np.asarray(out["success"])[v]
        total += int(v.sum())
        ok += int((r > 0.5).sum())
        if "collided" in out:
            collided += int(np.asarray(out["collided"])[v].sum())
        valid += int(v.sum())
        print(f"wave {w}: success {ok}/{total}", flush=True)
    rate = ok / max(total, 1)
    msg = (f"expert success in {CLUTTER}-obstacle dynamic-clutter scenes: "
           f"{rate:.3f} ({total} valid episodes, {time.time()-t0:.0f}s)")
    print(msg)
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        f.write("# Expert success in dynamic-clutter scenes\n\n")
        f.write(f"{CLUTTER} simulated obstacle bodies per scene "
                f"(physics/multi.py), CHOMP expert, {total} valid "
                f"episodes.\n\n{msg}\n")


if __name__ == "__main__":
    main()
