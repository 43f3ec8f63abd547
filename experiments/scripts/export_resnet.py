"""Export a trained image-mode agent's policy ResNet encoder to a
torchvision-layout .npz, reloadable via AgentConfig.pretrained_resnet.

The zero-egress substitute for ImageNet weights (reference pretrains
with torchvision's downloaded resnet18, core/networks.py:38-58,118):
pretrain on one object library in sim, export here, and initialize the
next run's encoders from the file through the SAME ingestion path a
real torchvision checkpoint would take (models/resnet.py
load_torch_state; exact-inverse round-trip tested in
tests/test_image_mode.py::test_export_round_trip).

    CKPT=output/bc_image_pre OUT=output/resnet18_sim.npz IMG=64 \
        python experiments/scripts/export_resnet.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

import jax  # noqa: E402

from gaddpg_tpu.agents.config import AgentConfig  # noqa: E402
from gaddpg_tpu.agents.state import create_agent_state  # noqa: E402
from gaddpg_tpu.models.resnet import export_torch_state  # noqa: E402
from gaddpg_tpu.train.checkpoints import load_agent  # noqa: E402

CKPT = os.environ["CKPT"]
OUT = os.environ.get("OUT", os.path.join(CKPT, "resnet18_sim.npz"))
IMG = int(os.environ.get("IMG", 64))


def main():
    cfg = AgentConfig(use_image=True, image_size=IMG, batch_size=2)
    state = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=70)
    loaded = load_agent(state, CKPT)
    assert loaded is not None, f"no checkpoint under {CKPT}"
    sd = export_torch_state({
        "params": loaded.feat_params["encoder"],
        "batch_stats": loaded.feat_stats["encoder"],
    })
    np.savez(OUT, **sd)
    print(f"exported {len(sd)} tensors (conv1 {sd['conv1.weight'].shape}) "
          f"-> {OUT}")


if __name__ == "__main__":
    main()
