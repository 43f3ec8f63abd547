"""Pallas TPU kernels for the point-cloud hot ops.

Authored against real TPU hardware (VMEM-resident state, lane-friendly
layouts). The build environment's device only supports interpret mode
for Pallas, so `use_pallas()` gates dispatch: real TPU -> compiled
kernel, anywhere else -> the XLA implementations in ops/sampling.py
(tests exercise the kernels in interpret mode for parity).

Kernel notes (see PERF.md): FPS is an inherently sequential argmax
chain -- the XLA version round-trips the (N,) distance register through
HBM every iteration; in Pallas it stays in VMEM for the whole loop.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_pallas() -> bool:
    """Compiled Pallas only on real TPU backends."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return dev.platform == "tpu"


def _fps_kernel(xyz_ref, out_ref, dist_ref):
    """xyz (N, 3) VMEM; out (npoint,) int32; dist (N,) f32 scratch."""
    n = xyz_ref.shape[0]
    npoint = out_ref.shape[0]
    dist_ref[:] = jnp.full((n,), 1e10, jnp.float32)
    out_ref[0] = 0

    def body(i, last):
        # squared distance to the last selected point
        px = xyz_ref[last, 0]
        py = xyz_ref[last, 1]
        pz = xyz_ref[last, 2]
        dx = xyz_ref[:, 0] - px
        dy = xyz_ref[:, 1] - py
        dz = xyz_ref[:, 2] - pz
        d = dx * dx + dy * dy + dz * dz
        dist_ref[:] = jnp.minimum(dist_ref[:], d)
        nxt = jnp.argmax(dist_ref[:]).astype(jnp.int32)
        out_ref[i] = nxt
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz, npoint: int, interpret: bool = False):
    """Furthest point sampling indices (npoint,) for xyz (N, 3)."""
    n = xyz.shape[0]
    return pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((npoint,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n,), jnp.float32)
            if not interpret
            else pltpu.VMEM((n,), jnp.float32)
        ],
        interpret=interpret,
    )(xyz.astype(jnp.float32))


def _ball_group_kernel(centers_ref, xyz_ref, out_ref, *, radius, nsample):
    """For one center block: first-nsample-in-radius grouping.

    centers (S, 3); xyz (N, 3); out (S, nsample) int32. Order-preserving
    first-k with first-hit padding (pointnet2 CUDA semantics).
    """
    s = centers_ref.shape[0]
    n = xyz_ref.shape[0]
    order = jax.lax.broadcasted_iota(jnp.int32, (s, n), 1)
    cx = centers_ref[:, 0:1]
    cy = centers_ref[:, 1:2]
    cz = centers_ref[:, 2:3]
    dx = cx - xyz_ref[:, 0][None, :]
    dy = cy - xyz_ref[:, 1][None, :]
    dz = cz - xyz_ref[:, 2][None, :]
    d2 = dx * dx + dy * dy + dz * dz
    in_ball = d2 <= radius * radius
    key = jnp.where(in_ball, order, n + order)
    neg, idx = jax.lax.top_k(-key, nsample)
    valid = (-neg) < n
    first = idx[:, 0:1]
    idx = jnp.where(valid, idx, first)
    any_hit = jnp.any(in_ball, axis=-1, keepdims=True)
    nearest = jnp.argmin(d2, axis=-1, keepdims=True).astype(jnp.int32)
    out_ref[:, :] = jnp.where(any_hit, idx, nearest)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "interpret"))
def ball_query_pallas(centers, xyz, radius: float, nsample: int,
                      interpret: bool = False):
    """(S, nsample) ball-query indices; one kernel, everything in VMEM."""
    kernel = functools.partial(_ball_group_kernel, radius=radius, nsample=nsample)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((centers.shape[0], nsample), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(centers.astype(jnp.float32), xyz.astype(jnp.float32))
