"""Tiny BC training slice: collect expert episodes, overfit BC on them.

    JAX_PLATFORMS=cpu python examples/train_bc_small.py
"""

import os
import time

import numpy as np

from gaddpg_tpu.envs.assets import box_asset
from gaddpg_tpu.train.config import load_config
from gaddpg_tpu.train.loop import Trainer


def main():
    cfg = load_config(overrides={
        "num_envs": int(os.environ.get("ENVS", 4)),
        "batch_size": 32,
        "updates_per_iter": 2,
        "explore_ratio": 0.0,   # expert-only data
        "dart": False,
        "max_epoch": 100,
        "output_dir": "output/bc_small",
    }, policy="BC")
    lib = box_asset(0.05, 0.05, 0.12, mass=0.2)
    tr = Trainer(cfg, lib=lib)

    from gaddpg_tpu import replay

    # scene randomization can invalidate envs; collect waves until the
    # buffer can serve a full batch
    for _ in range(10):
        t0 = time.time()
        stats = tr.collect()
        print(f"[collect] {time.time()-t0:.1f}s {stats}")
        if int(replay.upper_idx(tr.buffer)) >= cfg.batch_size:
            break
    losses = []
    for i in range(int(os.environ.get("ITERS", 8))):
        t0 = time.time()
        m = tr.train_iter()
        if m:
            losses.append(m["bc_loss"])
            print(f"[train {i}] bc_loss={m['bc_loss']:.4f} "
                  f"aux={m['policy_grasp_aux_loss']:.4f} ({time.time()-t0:.1f}s)")
    assert losses and not np.isnan(losses[-1]), "BC produced NaN"
    print("first->last bc_loss:", losses[0], "->", losses[-1])


if __name__ == "__main__":
    main()
