"""Fused set-abstraction grouped-MLP Pallas kernel (inference path).

The FLOP bulk of the PointNet++ trunk is the SA stage: gather the K
group members of each of S centers, run a 3-layer shared MLP over every
grouped point, max-pool over the group
(reference: core/networks.py:66-81 PointnetSAModule -> its CUDA
grouping + Conv2d stack). The XLA path (models/pointnet.py) already
turns each MLP layer into one big matmul, but between layers the
(B, S, K, C) activations round-trip through HBM, and the gather
materializes a (B, S, K, C_in) tensor it reads exactly once.

This kernel fuses gather -> MLP(3 layers, folded BatchNorm) -> max-pool
into ONE pallas_call per SA level: the (N, C_in) point table, all
weights, and the running max live in VMEM; the gather is a one-hot
matmul on the MXU (no dynamic addressing, which Mosaic VMEM forbids);
the K group slots stream through a fori_loop so per-step working memory
stays at (S, N) + (S, C) registers.

Inference-only by design: BatchNorm folds into the Dense weights only
with running statistics (eval mode). Training keeps the XLA path, whose
autodiff + batch-stats handling XLA already fuses well; the serving /
rollout hot loop (select_action at eval, reference: core/agent.py:82-125)
is what this accelerates.

Dispatch: GADDPG_PALLAS_SA=0 off | 1 force | unset -> on for real TPU
backends. models/pointnet.py routes eval-mode SA stages here.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sa_fused_enabled() -> bool:
    env = os.environ.get("GADDPG_PALLAS_SA", "")
    if env == "0":
        return False
    if env in ("1", "interpret"):  # "interpret": CPU parity testing
        return True
    from gaddpg_tpu.ops.pallas_kernels import use_pallas

    return use_pallas()


def sa_interpret() -> bool:
    """True when the dispatch should run the kernel in interpret mode
    (CPU parity tests set GADDPG_PALLAS_SA=interpret)."""
    return os.environ.get("GADDPG_PALLAS_SA", "") == "interpret"


def fold_bn(kernel, bias, scale, bn_bias, mean, var, eps: float = 1e-5):
    """Fold an eval-mode BatchNorm into the preceding Dense.

    y = ((x @ W + b) - mean) / sqrt(var + eps) * scale + bn_bias
      =  x @ (W * s) + ((b - mean) * s + bn_bias),  s = scale / sqrt(var+eps)
    """
    s = scale / jnp.sqrt(var + eps)
    return kernel * s[None, :], (bias - mean) * s + bn_bias


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _sa_gather_mlp_kernel(idx_ref, full_ref, cpad_ref,
                          w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                          out_ref):
    """idx (S, K) int32; full (N, Cin) point table; cpad (S, Cin) center
    offsets (xyz in cols 0:3, zero elsewhere); w/b folded Dense+BN;
    out (S, C3).

    Loop over the K group slots: one-hot gather (MXU matmul), relative
    offset, 3 fused Dense+ReLU layers, running max. ReLU outputs are
    >= 0, so a zero accumulator IS the max-pool identity.
    """
    S, K = idx_ref.shape
    N = full_ref.shape[0]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (S, N), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
    full = full_ref[:]
    cpad = cpad_ref[:]
    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    w3, b3 = w3_ref[:], b3_ref[:]

    def body(k, acc):
        # column k of idx without dynamic slicing (masked reduce)
        idx_k = jnp.sum(
            jnp.where(col == k, idx_ref[:], 0), axis=1, keepdims=True
        )  # (S, 1)
        onehot = (iota_n == idx_k).astype(jnp.float32)  # (S, N)
        x = _mm(onehot, full) - cpad                    # gathered, centered
        h = jnp.maximum(_mm(x, w1) + b1, 0.0)
        h = jnp.maximum(_mm(h, w2) + b2, 0.0)
        h = jnp.maximum(_mm(h, w3) + b3, 0.0)
        return jnp.maximum(acc, h)

    out_ref[:] = jax.lax.fori_loop(
        0, K, body, jnp.zeros(out_ref.shape, jnp.float32)
    )


def _mlp_maxpool_kernel(full_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        w3_ref, b3_ref, out_ref):
    """Group-all SA: MLP over all N points at once, max-pool to (1, C3)."""
    x = full_ref[:]
    h = jnp.maximum(_mm(x, w1_ref[:]) + b1_ref[:], 0.0)
    h = jnp.maximum(_mm(h, w2_ref[:]) + b2_ref[:], 0.0)
    h = jnp.maximum(_mm(h, w3_ref[:]) + b3_ref[:], 0.0)
    out_ref[:] = jnp.max(h, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sa_gather_mlp(group_idx, full, center_pad, weights, interpret: bool = False):
    """Fused SA level for ONE cloud.

    group_idx (S, K) int32; full (N, Cin) = [xyz | feats]; center_pad
    (S, Cin) with new_xyz in cols 0:3; weights = ((w1, b1), (w2, b2),
    (w3, b3)) BN-folded. Returns pooled (S, C3) f32.
    """
    (w1, b1), (w2, b2), (w3, b3) = weights
    S = group_idx.shape[0]
    C3 = w3.shape[1]
    args = [
        group_idx.astype(jnp.int32), full.astype(jnp.float32),
        center_pad.astype(jnp.float32),
        w1.astype(jnp.float32), b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(jnp.float32), b2.reshape(1, -1).astype(jnp.float32),
        w3.astype(jnp.float32), b3.reshape(1, -1).astype(jnp.float32),
    ]
    return pl.pallas_call(
        _sa_gather_mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((S, C3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_maxpool(full, weights, interpret: bool = False):
    """Fused group-all SA for ONE cloud: full (N, Cin) -> (1, C3)."""
    (w1, b1), (w2, b2), (w3, b3) = weights
    C3 = w3.shape[1]
    args = [
        full.astype(jnp.float32),
        w1.astype(jnp.float32), b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(jnp.float32), b2.reshape(1, -1).astype(jnp.float32),
        w3.astype(jnp.float32), b3.reshape(1, -1).astype(jnp.float32),
    ]
    return pl.pallas_call(
        _mlp_maxpool_kernel,
        out_shape=jax.ShapeDtypeStruct((1, C3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def folded_sa_weights(params, stats, n_layers: int = 3):
    """BN-folded (w, b) list for one SetAbstraction's Dense_i/BatchNorm_i."""
    out = []
    for i in range(n_layers):
        d = params[f"Dense_{i}"]
        bn = params[f"BatchNorm_{i}"]
        st = stats[f"BatchNorm_{i}"]
        out.append(fold_bn(
            jnp.asarray(d["kernel"], jnp.float32),
            jnp.asarray(d["bias"], jnp.float32),
            jnp.asarray(bn["scale"], jnp.float32),
            jnp.asarray(bn["bias"], jnp.float32),
            jnp.asarray(st["mean"], jnp.float32),
            jnp.asarray(st["var"], jnp.float32),
        ))
    return tuple(out)


def sa_mlp_probe() -> bool:
    """Compile + run the fused kernel on a tiny problem and check it
    against the plain-XLA computation; used by bench.py to report the
    pallas_sa_mlp flag. Raises on failure (caller decides fallback).

    Tolerance is device-realistic (1e-2): on a real MXU both the kernel
    and the XLA reference run their matmuls at default (bf16-input)
    precision but may accumulate in different orders, so they agree to
    ~4e-3, not 2e-5. Exact numeric parity is pinned separately by
    tests/test_pallas_sa.py on CPU (interpret mode, f32, 2e-5)."""
    import numpy as np

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    N, S, K, Cin = 64, 8, 16, 7
    dims = (16, 16, 32)
    full = jax.random.normal(ks[0], (N, Cin))
    idx = jax.random.randint(ks[1], (S, K), 0, N)
    cpad = jnp.zeros((S, Cin)).at[:, :3].set(
        jax.random.normal(ks[2], (S, 3)) * 0.1
    )
    weights = []
    c = Cin
    for i, d in enumerate(dims):
        w = jax.random.normal(ks[3 + i], (c, d)) * 0.2
        b = jax.random.normal(ks[3 + i], (d,)) * 0.1
        weights.append((w, b))
        c = d
    out = sa_gather_mlp(idx, full, cpad, tuple(weights))

    x = jnp.take(full, idx, axis=0) - cpad[:, None, :]
    h = x
    for w, b in weights:
        h = jnp.maximum(h @ w + b, 0.0)
    ref = jnp.max(h, axis=1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-2, atol=1e-2
    )
    return True
