"""Regenerate the proc seed index manifest under the CPU-pinned
deterministic grasp-verify path (round-5 fix).

The round-4 index was generated with verify_grasps_physics running on
the tunnel device; its float rounding moved 171/1520 borderline grasp
candidates across the displacement threshold, so a fresh CPU rebuild
failed library_from_seed_index's reproducibility check and blocked
every proc-library consumer. verify_grasps_physics is now pinned to the
CPU backend + XLA scan (data/mesh_import.py); this script re-walks the
SAME seeds, rewrites each entry's grasp/sphere counts, and saves the
split libcaches so downstream consumers skip the 45-minute rebuild.

    python experiments/scripts/regen_seed_index.py [index.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gaddpg_tpu.data.mesh_import import PACKING_VERSION, extend_library
from gaddpg_tpu.data.procgen import proc_entry
from gaddpg_tpu.envs.assets import empty_library, save_library

PATH = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(__file__), "..", "object_index", "proc_shapenet_1216.json")
PATH = os.path.abspath(PATH)


def main():
    with open(PATH) as f:
        idx = json.load(f)
    assert idx["format"] == "proc_seed_index"
    # re-pin the manifest to the CURRENT pipeline version: this script's
    # whole job is regenerating the per-object counts under it
    idx["packing_version"] = PACKING_VERSION
    t0 = time.time()
    changed = 0
    for split in ("train", "test"):
        entries, names = [], []
        for i, e in enumerate(idx[split]):
            built, name = proc_entry(int(e["seed"]))
            ng = 0 if built["grasps"] is None else int(len(built["grasps"]))
            ns = int(len(built["spheres"]))
            if ng != int(e["grasps"]) or ns != int(e["spheres"]):
                changed += 1
            e["grasps"], e["spheres"] = ng, ns
            if ng == 0:
                print(f"WARNING: {name} now has 0 grasps", flush=True)
                continue
            entries.append(built)
            names.append(name)
            if (i + 1) % 100 == 0:
                print(f"[{split}] {i + 1}/{len(idx[split])} "
                      f"({time.time() - t0:.0f}s, {changed} changed)",
                      flush=True)
        lib = extend_library(empty_library(), entries, names)
        save_library(lib, f"{PATH}.{split}.v{PACKING_VERSION}.libcache.npz")
        print(f"[{split}] cached {len(names)} objects", flush=True)
    # JSON once at the end, then re-touch every split cache: the loaders
    # accept a cache iff its mtime >= the JSON's, and the round-5 run of
    # this script wrote the JSON again during the TEST pass, silently
    # staling the train cache and costing every consumer a ~45-minute
    # rebuild
    with open(PATH, "w") as f:
        json.dump(idx, f, indent=0)
    for split in ("train", "test"):
        cache = f"{PATH}.{split}.v{PACKING_VERSION}.libcache.npz"
        if os.path.exists(cache):
            os.utime(cache, None)
    print(f"done: {changed} entries updated, {time.time() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
