"""Image-mode BC smoke: collect expert episodes with RGBDM observations,
overfit BC through the ResNet-18 feature extractor.

The image-observation variant of the training stack (use_image,
reference: experiments/config.py:105, core/networks.py:106-147):

    JAX_PLATFORMS=cpu python examples/train_bc_image.py

IMG=32 keeps the CPU run affordable; real runs use the reference's 112.
"""

import os
import time

import numpy as np

from gaddpg_tpu import replay
from gaddpg_tpu.envs.assets import box_asset
from gaddpg_tpu.train.config import load_config
from gaddpg_tpu.train.loop import Trainer


def main():
    img = int(os.environ.get("IMG", 32))
    cfg = load_config(overrides={
        "num_envs": int(os.environ.get("ENVS", 4)),
        "batch_size": 16,
        "updates_per_iter": 2,
        "explore_ratio": 0.0,
        "dart": False,
        "max_epoch": 100,
        "output_dir": "output/bc_image",
        "use_image": True,
        "IMG_SIZE": img,
        # per-episode visual randomization (albedo/lighting/noise,
        # reference: env/panda_scene.py:599-618,680-690)
        "domain_rand": os.environ.get("DOMAIN_RAND", "0") == "1",
    }, policy="BC")
    assert cfg.env.use_image and cfg.env.camera.width == img
    lib = box_asset(0.05, 0.05, 0.12, mass=0.2)
    tr = Trainer(cfg, lib=lib)

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
    assert losses and not np.isnan(losses[-1]), "image BC produced NaN"
    assert losses[-1] < losses[0], "image BC loss did not decrease"
    print("first->last bc_loss:", losses[0], "->", losses[-1])


if __name__ == "__main__":
    main()
