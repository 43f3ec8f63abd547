"""One-time builder for mesh-index library caches.

Loads each split of a mesh-index JSON through the native pipeline
(voxel fill, sphere pack, antipodal + close-and-hold verification,
data/mesh_import.asset_from_mesh) so the `<index>.<split>.libcache.npz`
written by envs/assets.library_from_mesh_index is ready before a
train/eval process needs it (the build costs ~20 s/object on this
host; reference analogue: misc/grasp_data_reader.py's cached
extraction).

    python experiments/scripts/build_libcache.py [index.json]
Env knobs: SPLITS ("train,test").
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401  (CPU override)

from gaddpg_tpu.envs.assets import library_from_index  # noqa: E402

INDEX = sys.argv[1] if len(sys.argv) > 1 else "output/proc_shapenet/proc_shapenet.json"
SPLITS = os.environ.get("SPLITS", "train,test").split(",")


def main():
    for split in SPLITS:
        t0 = time.time()
        lib = library_from_index(INDEX, split)
        print(f"{split}: {len(lib.names)} objects in {time.time()-t0:.0f}s",
              flush=True)
    print("cache build done", flush=True)


if __name__ == "__main__":
    main()
