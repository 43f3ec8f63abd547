"""Expert success over the procedural ShapeNet-scale object sweep.

The evidence artifact for mesh-pipeline breadth: N procedurally
generated meshes (data/procgen.py) go through the native voxel-fill /
sphere-pack / antipodal-grasp / physics-verify pipeline, then the
planner expert is evaluated over randomized scenes on that library --
the counterpart of the reference's ShapeNet train sweep
(reference: experiments/object_index/filter_shapenet.json +
env/panda_scene.py:523-573).

    JAX_PLATFORMS=cpu python experiments/scripts/eval_proc_shapenet.py
Env knobs: N_OBJECTS (24), WAVES (4), ENVS (24), OUT.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gaddpg_tpu.envs.assets import library_from_index  # noqa: E402
from gaddpg_tpu.train.config import load_config  # noqa: E402
from gaddpg_tpu.train.loop import Trainer  # noqa: E402

N_OBJECTS = int(os.environ.get("N_OBJECTS", 24))
WAVES = int(os.environ.get("WAVES", 4))
ENVS = int(os.environ.get("ENVS", 24))
OUT = os.environ.get("OUT", "output/proc_shapenet_eval.md")


def main():
    t0 = time.time()
    lib = library_from_index(f"proc_shapenet:{N_OBJECTS}", "train")
    print(f"library: {lib.num_objects} mesh objects "
          f"({time.time() - t0:.0f}s to build+verify)", flush=True)
    cfg = load_config(overrides={"num_envs": ENVS})
    tr = Trainer(cfg, lib=lib)
    rate, perf = tr.evaluate(episodes=WAVES, expert=True)
    table = perf.table()
    print(table)
    print(f"proc-shapenet expert success: {rate:.3f} "
          f"({WAVES * ENVS} episodes, {time.time() - t0:.0f}s)")
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        f.write("# Expert success on the procedural ShapeNet-scale sweep\n\n")
        f.write(f"{lib.num_objects} mesh objects through the native "
                f"pipeline; {WAVES * ENVS} randomized episodes.\n\n")
        f.write("```\n" + table + "\n```\n")
        f.write(f"\nTOTAL expert success: {rate:.3f}\n")


if __name__ == "__main__":
    main()
