"""Does the fused TRAIN path actually dispatch inside the full encoder
on this device, and how big is the fused-vs-XLA deviation module-side?

Applies PointNetEncoder (flagship shape) train=True twice with
GADDPG_PALLAS_SA_TRAIN toggled between traces, same params/input, and prints
output deltas + wall times. Identical outputs == no dispatch.

    python experiments/scripts/diag_dispatch.py          # device
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gaddpg_tpu.models.pointnet import PointNetEncoder  # noqa: E402

B = int(os.environ.get("B", 64))
N = int(os.environ.get("N", 1024))


def run(mode, enc, v, pc):
    os.environ["GADDPG_PALLAS_SA_TRAIN"] = mode
    f = lambda: enc.apply(v, pc, train=True, mutable=["batch_stats"])
    (out, ups) = f()  # trace + run
    out.block_until_ready()
    t0 = time.time()
    (out, ups) = f()
    out.block_until_ready()
    dt = time.time() - t0
    return np.asarray(out), ups["batch_stats"], dt


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    enc = PointNetEncoder(in_channels=4, nclusters=32)
    key = jax.random.PRNGKey(0)
    pc = jax.random.normal(key, (B, N, 4)) * 0.05
    v = enc.init(jax.random.PRNGKey(1), pc, train=True)

    out_x, bs_x, t_x = run("0", enc, v, pc)
    out_f, bs_f, t_f = run("", enc, v, pc)  # device default (dispatch)
    d = np.abs(out_f - out_x)
    print(f"xla   t={t_x:.3f}s  fused t={t_f:.3f}s", flush=True)
    print(f"out  max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"scale={np.abs(out_x).mean():.3e}", flush=True)
    if d.max() == 0.0:
        print("IDENTICAL -> fused train path did NOT dispatch", flush=True)
    xl = dict(jax.tree_util.tree_leaves_with_path(bs_x))
    worst = (0.0, None)
    for path, leaf in jax.tree_util.tree_leaves_with_path(bs_f):
        dd = float(np.abs(np.asarray(leaf) - np.asarray(xl[path])).max())
        sc = float(np.abs(np.asarray(xl[path])).max()) + 1e-9
        if dd / sc > worst[0]:
            worst = (dd / sc, path)
    print(f"batch_stats worst rel delta: {worst[0]:.3e} at {worst[1]}",
          flush=True)


if __name__ == "__main__":
    main()
