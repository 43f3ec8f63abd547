"""Success-vs-updates curve: evaluate every SNAP_EVERY training
snapshot (train_bc_long.py SNAP_EVERY=k -> OUT/snap_<n>/) in ONE
process -- env/library setup and the rollout jit are paid once instead
of per checkpoint (minutes each on this host).

    CKPT=output/bc_proc_r4c INDEX=... SPLIT=test WAVES=4 \
        python experiments/scripts/eval_snaps.py

Env knobs: as eval_policy.py, plus CKPT = the run dir containing
snap_* subdirs (agent_latest.msgpack is also evaluated, labeled
"latest").
"""

import os
import re
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
CKPT = os.environ["CKPT"]
WAVES = int(os.environ.get("WAVES", 4))
ENVS = int(os.environ.get("ENVS", 24))
SEED = int(os.environ.get("SEED", 3))
COL_AUX = float(os.environ.get("COL_AUX", 0.0))


def run_eval(tr, label):
    total, ok, collided = 0, 0, 0
    t0 = time.time()
    for _ in range(WAVES):
        out = tr.worker.evaluate(tr.agent_state, tr._next_key(), expert=False)
        v = np.asarray(out["valid_scene"]) > 0
        r = np.asarray(out["success"])[v]
        total += int(v.sum())
        ok += int((r > 0.5).sum())
        if "collided" in out:
            collided += int(np.asarray(out["collided"])[v].sum())
    rate = ok / max(total, 1)
    print(f"SNAP {label}: success={rate:.3f} collided={collided}/{total} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return rate


def main():
    cfg = load_config(overrides={
        "num_envs": ENVS, "index_file": INDEX, "index_split": SPLIT,
        "num_clutter": CLUTTER, "output_dir": "output/eval_tmp",
        "RNG_SEED": SEED,
        "collision_aux_weight": COL_AUX,
    }, policy="BC")
    lib = library_from_index(INDEX, SPLIT)
    if os.environ.get("VERIFY_GRASPS", "1") == "1":
        from gaddpg_tpu.envs.assets import verify_library_grasps
        lib = verify_library_grasps(lib)
    tr = Trainer(cfg, lib=lib)

    snaps = []
    for d in sorted(os.listdir(CKPT)):
        m = re.fullmatch(r"snap_(\d+)", d)
        if m and os.path.isdir(os.path.join(CKPT, d)):
            snaps.append((int(m.group(1)), os.path.join(CKPT, d)))
    snaps.sort()
    snaps.append((-1, CKPT))  # final/latest

    base_state = tr.agent_state
    for n, path in snaps:
        loaded = load_agent(base_state, path)
        if loaded is None:
            print(f"SNAP {n}: no checkpoint under {path}", flush=True)
            continue
        tr.agent_state = loaded
        run_eval(tr, f"{os.path.basename(CKPT)}@"
                     f"{'latest' if n < 0 else n}")


if __name__ == "__main__":
    main()
