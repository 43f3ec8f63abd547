"""On-device deviation of the fused SA train forward at REALISTIC
shapes (the bench probe only checks B=2, N=32, S=4, K=8).

Compares pallas_sa_train.sa_train_fused / groupall_train_fused against
the XLA reference at the flagship encoder's SA1 shape (B=64, N=1024,
S=32, K=64) and prints max/mean abs+rel deviation of pooled outputs and
batch stats.

    python experiments/scripts/diag_sa_train.py        # device
    JAX_PLATFORMS=cpu GADDPG_PALLAS_SA_TRAIN=interpret ...   # CPU parity
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gaddpg_tpu.ops.pallas_sa import sa_interpret  # noqa: E402
from gaddpg_tpu.ops.pallas_sa_train import (  # noqa: E402
    _xla_full, _xla_groupall_full, groupall_train_fused, sa_train_fused,
)

B = int(os.environ.get("B", 64))
N = int(os.environ.get("N", 1024))
S = int(os.environ.get("S", 32))
K = int(os.environ.get("K", 64))
CIN = 7
DIMS = (64, 64, 128)


def dev(name, a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    ab = np.abs(a - b)
    rel = ab / (np.abs(b) + 1e-6)
    print(f"{name:24s} max|d|={ab.max():.3e} mean|d|={ab.mean():.3e} "
          f"maxrel={rel.max():.3e} ref_scale={np.abs(b).mean():.3e}",
          flush=True)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    full = jax.random.normal(ks[0], (B, N, CIN)) * 0.5
    idx = jax.random.randint(ks[1], (B, S, K), 0, N)
    cpad = jnp.zeros((B, S, CIN)).at[:, :, :3].set(
        jax.random.normal(ks[2], (B, S, 3)) * 0.1)
    dense = []
    c = CIN
    for i, d in enumerate(DIMS):
        w = jax.random.normal(ks[3 + i], (c, d)) * (1.0 / np.sqrt(c))
        b = jax.random.normal(ks[6 + i], (d,)) * 0.1
        dense.append((w, b, jnp.ones((d,)), jnp.zeros((d,))))
        c = d
    dense = tuple(dense)
    interp = sa_interpret()

    out_f, st_f = jax.jit(
        lambda *a: sa_train_fused(*a, interp))(idx, full, cpad, dense)
    out_x, st_x = jax.jit(_xla_full)(idx, full, cpad, dense)
    dev("pooled", out_f, out_x)
    for i, ((mf, vf), (mx, vx)) in enumerate(zip(st_f, st_x)):
        dev(f"stats{i} mean", mf, mx)
        dev(f"stats{i} var", vf, vx)

    ga_f, gst_f = jax.jit(
        lambda *a: groupall_train_fused(*a, interp))(full, dense)
    ga_x, gst_x = jax.jit(_xla_groupall_full)(full, dense)
    dev("groupall pooled", ga_f, ga_x)
    for i, ((mf, vf), (mx, vx)) in enumerate(zip(gst_f, gst_x)):
        dev(f"ga stats{i} mean", mf, mx)
        dev(f"ga stats{i} var", vf, vx)

    # calibration row: the PRODUCTION XLA trunk runs its Dense layers in
    # bfloat16 (pointnet.py dtype=compute_dtype, GADDPG_BF16=1 default).
    # Recompute the same forward with per-layer bf16 casts and measure
    # ITS deviation from the f32 reference -- the scale of forward error
    # the production path already accepts. If the fused kernel's
    # deviation (above) is far below this, "drift vs XLA" is the wrong
    # framing: the kernel is the more faithful forward.
    def _xla_bf16(group_idx, full, cpad, dense):
        g = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(full, group_idx)
        h = g - cpad[:, :, None, :]
        outs = []
        for (w, b, sc, bi) in dense:
            z = (h.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)
                 ).astype(jnp.float32) + b
            m = jnp.mean(z, axis=(0, 1, 2))
            v = jnp.mean(jnp.square(z), axis=(0, 1, 2)) - jnp.square(m)
            outs.append((m, v))
            a = sc / jnp.sqrt(v + 1e-5)
            h = jnp.maximum(z * a + (bi - m * a), 0.0)
        return jnp.max(h, axis=2), tuple(outs)

    out_b, st_b = jax.jit(_xla_bf16)(idx, full, cpad, dense)
    dev("bf16-XLA pooled (vs f32)", out_b, out_x)
    for i, ((mb, vb), (mx, vx)) in enumerate(zip(st_b, st_x)):
        dev(f"bf16 stats{i} mean", mb, mx)
        dev(f"bf16 stats{i} var", vb, vx)


if __name__ == "__main__":
    main()
