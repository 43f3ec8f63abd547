"""Generate the procedural ShapeNet-scale object index (OBJ files + JSON).

The stand-in for downloading ShapeNet/ACRONYM (reference:
experiments/object_index/filter_shapenet.json, 1216 train / 2130 test):
writes `meshes/*.obj` + `proc_shapenet.json` under --out, loadable via

    library_from_index("<out>/proc_shapenet.json", split="train")

which runs every OBJ through the native voxel-fill/sphere-pack/grasp
pipeline exactly as a real mesh download would.

Usage: python experiments/scripts/gen_proc_shapenet.py \
           [--out output/proc_shapenet] [--train 120] [--test 40]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401  (CPU override, see _platform.py)

from gaddpg_tpu.data.procgen import (  # noqa: E402
    export_proc_index,
    export_proc_seed_index,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/proc_shapenet")
    ap.add_argument("--train", type=int, default=120)
    ap.add_argument("--test", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--seed-index", default="",
        help="write a repo-shippable proc_seed_index JSON (seeds + grasp "
             "manifest, no OBJ files) to this path instead; regenerates "
             "experiments/object_index/proc_shapenet_1216.json with "
             "--train 1216 --test 304")
    args = ap.parse_args()
    if args.seed_index:
        path = export_proc_seed_index(args.seed_index, args.train, args.test,
                                      seed0=args.seed)
    else:
        path = export_proc_index(args.out, args.train, args.test,
                                 seed0=args.seed)
    print("wrote", path)


if __name__ == "__main__":
    main()
