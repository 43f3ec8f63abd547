"""FPS / ball-query / grouping in pure XLA.

Design notes (vs the CUDA reference `pointnet2_ops`):
- clouds are small and fixed-size (1024 + 6 points,
  reference: experiments/config.py:143), so distance matrices fit in
  VMEM and `top_k`/`argmax` beat hand-written scatter kernels;
- FPS is an inherently sequential argmax chain -> `lax.fori_loop` over
  `npoint` steps on a (N,) min-distance register, vmapped over batch;
- ball query reproduces the reference semantics: the first `nsample`
  points within `radius` of a center, *padded with the first hit*.
"""

from functools import partial

import jax
import jax.numpy as jnp

from gaddpg_tpu.ops import pallas_kernels


@partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sampling(xyz, npoint: int, valid=None):
    """Indices of `npoint` FPS-selected points from xyz (N, 3).

    Starts from index 0 like the CUDA kernel. `valid` (N,) optionally
    masks padding points out of selection. On TPU backends the Pallas
    kernel serves the unmasked path (see pallas_kernels.pallas_enabled).
    """
    if valid is None and pallas_kernels.pallas_enabled():
        # indices carry no tangents; stop_gradient keeps pallas_call out
        # of the autodiff (JVP of pallas_call is unsupported)
        return pallas_kernels.fps_pallas(jax.lax.stop_gradient(xyz), npoint)
    n = xyz.shape[0]
    big = jnp.asarray(1e10, xyz.dtype)
    invalid_penalty = jnp.zeros((n,), xyz.dtype) if valid is None else jnp.where(valid, 0.0, -big)

    def body(i, state):
        dists, idxs, last = state
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists + invalid_penalty)
        idxs = idxs.at[i].set(nxt)
        return dists, idxs, nxt

    dists0 = jnp.full((n,), big)
    idxs0 = jnp.zeros((npoint,), jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (dists0, idxs0, jnp.int32(0)))
    return idxs


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query(centers, xyz, radius: float, nsample: int, valid=None):
    """(S, nsample) indices of points within `radius` of each center.

    Order-preserving first-k semantics with first-hit padding, matching
    the reference CUDA ball_query. Out-of-radius rows (no hits) return
    the nearest point so downstream grouping never reads garbage.
    """
    if valid is None and pallas_kernels.pallas_enabled():
        return pallas_kernels.ball_query_pallas(
            jax.lax.stop_gradient(centers), jax.lax.stop_gradient(xyz),
            radius, nsample,
        )
    n = xyz.shape[0]
    d2 = jnp.sum((centers[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)  # (S, N)
    in_ball = d2 <= radius * radius
    if valid is not None:
        in_ball = in_ball & valid[None, :]
    order = jnp.arange(n, dtype=jnp.int32)
    # key: valid points keep their index; invalid pushed past N.
    key = jnp.where(in_ball, order[None, :], n + order[None, :])
    k = min(nsample, n)
    neg_key, idx = jax.lax.top_k(-key, k)  # smallest keys first
    picked_valid = (-neg_key) < n
    if nsample > n:
        # fewer points than group slots (e.g. SA2 groups 128 of 32):
        # the CUDA kernel pre-fills the row with the first hit, so the
        # overflow slots pad with it too (max-pool downstream is
        # invariant to duplicates)
        pad = ((0, 0), (0, nsample - n))
        idx = jnp.pad(idx, pad)
        picked_valid = jnp.pad(picked_valid, pad)  # False -> first-hit pad
    # pad with the first picked entry (a valid hit if any exist)
    first = idx[:, :1]
    idx = jnp.where(picked_valid, idx, first)
    # centers with zero hits: fall back to nearest point
    any_hit = jnp.any(in_ball, axis=-1, keepdims=True)
    nearest = jnp.argmin(d2, axis=-1, keepdims=True).astype(jnp.int32)
    idx = jnp.where(any_hit, idx, nearest)
    return idx.astype(jnp.int32)


def gather_points(points, idx):
    """points (N, C) indexed with idx (...,) -> (..., C)."""
    return jnp.take(points, idx, axis=0)


def group_points(xyz, feats, centers_idx, group_idx):
    """Build grouped features for set abstraction.

    xyz (N, 3); feats (N, C); centers_idx (S,); group_idx (S, K).
    Returns new_xyz (S, 3), grouped (S, K, 3 + C) where the first 3
    channels are center-relative offsets (pointnet2 `use_xyz=True`).
    """
    new_xyz = jnp.take(xyz, centers_idx, axis=0)
    g_xyz = jnp.take(xyz, group_idx, axis=0) - new_xyz[:, None, :]
    g_feat = jnp.take(feats, group_idx, axis=0)
    return new_xyz, jnp.concatenate([g_xyz, g_feat], axis=-1)


@partial(jax.jit, static_argnames=("npoints",))
def regularize_point_count(key, pc, npoints: int, valid=None):
    """Random up/down-sample a cloud (N, C) to exactly `npoints` rows.

    Functional analogue of `regularize_pc_point_count`
    (reference: core/utils.py:784-812) with the random-choice path
    (the reference's default; FPS is opt-in there too). When `valid`
    is given, sampling is restricted to valid rows (with replacement
    whenever fewer than npoints are valid).
    """
    n = pc.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    # Gumbel top-k gives a uniform sample without replacement among valid
    # rows; when count < npoints the top-k wraps into invalid rows, so we
    # remap those to uniform-with-replacement picks over valid rows.
    k1, k2 = jax.random.split(key)
    g = jax.random.gumbel(k1, (n,)) + jnp.where(valid, 0.0, -1e9)
    _, idx = jax.lax.top_k(g, min(npoints, n))
    if npoints > n:
        extra = jax.random.randint(k2, (npoints - n,), 0, n)
        idx = jnp.concatenate([idx, extra])
    picked_valid = jnp.take(valid, idx)
    count = jnp.maximum(jnp.sum(valid), 1)
    # replacement picks: uniform over the first `count` valid rows
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)  # valid rows first
    repl_pos = jax.random.randint(k2, (npoints,), 0, n) % count
    repl_idx = jnp.take(order, repl_pos)
    idx = jnp.where(picked_valid, idx, repl_idx)
    return jnp.take(pc, idx, axis=0), idx
