"""Pallas TPU kernels for the point-cloud hot ops.

These compile through the real Mosaic TPU lowering (validated against
this environment's remote-compile TPU backend), replacing the
pointnet2_ops CUDA kernels (reference: core/networks.py:10,66-81,
core/utils.py:32,793-800):

- FPS is an inherently sequential argmax chain; the XLA version
  round-trips the (N,) min-distance register through HBM every
  iteration, here it stays in VMEM for the whole loop.
- Ball query + first-k grouping runs as one kernel with the (S, N)
  distance matrix resident in VMEM.

Mosaic constraints shape the code: no scalar loads/stores to VMEM (so
coordinates arrive as (1, N)/(S, 1) planes and selected points are read
with masked reductions instead of dynamic indexing), no top_k (first-k
selection is a min-extract loop), index outputs go to SMEM (FPS) or are
accumulated with lane-iota selects (ball query).

Dispatch: `pallas_enabled()` routes models/pointnet.py through these
kernels on TPU backends (opt out with GADDPG_PALLAS=0); everywhere else
the XLA implementations in ops/sampling.py serve, and tests exercise
the kernels in interpret mode for parity.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 30  # python int: jnp constants would be captured as kernel consts


def use_pallas() -> bool:
    """True on TPU backends (compiled Pallas available)."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return dev.platform == "tpu"


def pallas_enabled() -> bool:
    """Dispatch switch for the model path: TPU backend, unless the user
    opts out with GADDPG_PALLAS=0 (or forces with GADDPG_PALLAS=1)."""
    env = os.environ.get("GADDPG_PALLAS", "")
    if env == "0":
        return False
    if env == "1":
        return True
    return use_pallas()


# ---------------------------------------------------------------------------
# Furthest point sampling
# ---------------------------------------------------------------------------


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, dist_ref):
    """x/y/z (1, N) f32 VMEM; out (1, npoint) int32 VMEM; dist (1, N) f32.

    Selected-point coordinates are read with a masked sum (iota == last)
    instead of a dynamic VMEM load; "argmax" is max + first-index-of-max
    so ties resolve like the CUDA kernel (lowest index); the output slot
    write is a lane-iota select (VMEM output keeps the kernel
    vmap-compatible -- SMEM blocks reject the batched block shape).
    """
    n = x_ref.shape[1]
    npoint = out_ref.shape[1]
    dist_ref[:] = jnp.full((1, n), 1e10, jnp.float32)
    out_ref[:] = jnp.zeros((1, npoint), jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    def body(i, last):
        sel = iota == last
        px = jnp.sum(jnp.where(sel, x_ref[:], 0.0))
        py = jnp.sum(jnp.where(sel, y_ref[:], 0.0))
        pz = jnp.sum(jnp.where(sel, z_ref[:], 0.0))
        dx = x_ref[:] - px
        dy = y_ref[:] - py
        dz = z_ref[:] - pz
        d = dx * dx + dy * dy + dz * dz
        dist_ref[:] = jnp.minimum(dist_ref[:], d)
        m = jnp.max(dist_ref[:])
        nxt = jnp.min(jnp.where(dist_ref[:] >= m, iota, _BIG)).astype(jnp.int32)
        out_ref[:] = jnp.where(col == i, nxt, out_ref[:])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz, npoint: int, interpret: bool = False):
    """Furthest point sampling indices (npoint,) for xyz (N, 3)."""
    x = xyz[None, :, 0].astype(jnp.float32)
    y = xyz[None, :, 1].astype(jnp.float32)
    z = xyz[None, :, 2].astype(jnp.float32)
    n = xyz.shape[0]
    out = pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((1, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out[0]


# ---------------------------------------------------------------------------
# Ball query (first-nsample-in-radius grouping)
# ---------------------------------------------------------------------------


def _ball_group_kernel(cx_ref, cy_ref, cz_ref, x_ref, y_ref, z_ref, out_ref,
                       *, radius, nsample):
    """centers (S, 1) x3; points (1, N) x3; out (S, nsample) int32 VMEM.

    Order-preserving first-k with first-hit padding (pointnet2 CUDA
    semantics: the row is pre-filled with the first hit, then
    overwritten as more hits are found); centers with zero hits fall
    back to their nearest point.
    """
    s = cx_ref.shape[0]
    n = x_ref.shape[1]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (s, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, nsample), 1)

    dx = cx_ref[:] - x_ref[:]
    dy = cy_ref[:] - y_ref[:]
    dz = cz_ref[:] - z_ref[:]
    d2 = dx * dx + dy * dy + dz * dz
    in_ball = d2 <= radius * radius

    any_hit = jnp.max(in_ball.astype(jnp.int32), axis=1, keepdims=True) > 0
    dmin = jnp.min(d2, axis=1, keepdims=True)
    nearest = jnp.min(
        jnp.where(d2 <= dmin, iota_n, _BIG), axis=1, keepdims=True
    ).astype(jnp.int32)

    key0 = jnp.where(in_ball, iota_n, _BIG)
    # init to BIG: columns never written (nsample > n) must pad with the
    # first hit below
    out_ref[:] = jnp.full((s, nsample), _BIG, jnp.int32)

    def body(k, key):
        cur = jnp.min(key, axis=1, keepdims=True)  # (S, 1) first remaining hit
        out_ref[:] = jnp.where(col == k, cur, out_ref[:])
        return jnp.where(iota_n == cur, _BIG, key)

    jax.lax.fori_loop(0, min(nsample, n), body, key0)

    picked = out_ref[:]
    first = jnp.min(
        jnp.where(col == 0, picked, _BIG), axis=1, keepdims=True
    )  # == picked[:, 0:1] without a lane slice
    picked = jnp.where(picked < n, picked, first)
    out_ref[:] = jnp.where(any_hit, picked, nearest)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "interpret"))
def ball_query_pallas(centers, xyz, radius: float, nsample: int,
                      interpret: bool = False):
    """(S, nsample) ball-query indices; one kernel, everything in VMEM."""
    kernel = functools.partial(_ball_group_kernel, radius=radius, nsample=nsample)
    cx = centers[:, 0:1].astype(jnp.float32)
    cy = centers[:, 1:2].astype(jnp.float32)
    cz = centers[:, 2:3].astype(jnp.float32)
    x = xyz[None, :, 0].astype(jnp.float32)
    y = xyz[None, :, 1].astype(jnp.float32)
    z = xyz[None, :, 2].astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((centers.shape[0], nsample), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cx, cy, cz, x, y, z)
