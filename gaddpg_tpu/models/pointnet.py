"""PointNet++ set-abstraction encoder in Flax (channels-last, MXU-friendly).

Architecture contract matches the reference `base_network`
(reference: core/networks.py:65-92) at model_scale=1:

    SA1: npoint=32, radius=0.02, nsample=64,  mlp (in+3) ->  64 ->  64 -> 128
    SA2: npoint=32, radius=0.04, nsample=128, mlp (128+3)-> 128 -> 128 -> 256
    SA3: group-all,                mlp (256+3)-> 256 -> 256 -> 512
    FC:  512 -> 1024 -> 512 (BatchNorm + ReLU after each)

Layout: we keep points channels-last so every "1x1 conv" is a Dense on
the trailing axis -> a single large matmul per layer on the MXU, instead
of the reference's NCHW Conv2d+CUDA-gather pipeline.
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn
import jax

from gaddpg_tpu.ops import pallas_sa, pallas_sa_train
from gaddpg_tpu.ops.sampling import (
    furthest_point_sampling,
    ball_query,
    group_points,
)


class SetAbstraction(nn.Module):
    """One PointNet++ SA level: sample centers, group, shared MLP, max-pool."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    # matmul compute dtype (params stay f32; BatchNorm computes in f32,
    # so activations re-enter f32 after every Dense+BN pair)
    dtype: Any = jnp.float32

    def _raw_dense_bn(self):
        """((kernel, bias, bn_scale, bn_bias),)*3 straight from the
        variable tree (same names the XLA branch's modules create)."""
        p = self.variables["params"]
        return tuple(
            (p[f"Dense_{i}"]["kernel"], p[f"Dense_{i}"]["bias"],
             p[f"BatchNorm_{i}"]["scale"], p[f"BatchNorm_{i}"]["bias"])
            for i in range(3)
        )

    def _update_bn_running(self, stats):
        """Feed the fused kernels' batch stats into the SAME BatchNorm
        modules the XLA branch uses, via a 2-element surrogate whose
        batch mean/var equal (m, v) exactly -- running averages and the
        variable tree stay identical across paths."""
        for m, v in stats:
            m = jax.lax.stop_gradient(m)
            s = jnp.sqrt(jnp.maximum(jax.lax.stop_gradient(v), 0.0))
            surrogate = jnp.stack([m - s, m + s])
            nn.BatchNorm(use_running_average=False, momentum=0.9,
                         dtype=jnp.float32)(surrogate)

    @nn.compact
    def __call__(self, xyz, feats, train: bool = True):
        """xyz (B, N, 3); feats (B, N, C) -> (B, S, 3), (B, S, mlp[-1])."""
        # eval-mode TPU path: the whole gather -> 3-layer MLP (BN folded
        # into the Dense weights) -> max-pool runs as ONE Pallas kernel
        # with the point table resident in VMEM (ops/pallas_sa.py).
        # train-mode TPU path (round-3 verdict item 2): streaming-stats
        # fused kernels + exact XLA-recompute backward
        # (ops/pallas_sa_train.py). Default ON for TPU backends since
        # round 5 -- the round-4 forward drift was the one-hot gather
        # matmul rounding point values at bf16 MXU precision, fixed
        # with Precision.HIGHEST (see the pallas_sa_train module
        # docstring). GADDPG_PALLAS_SA_TRAIN=0 opts out; init and
        # non-TPU keep the XLA layers below (autodiff + batch stats)
        use_fused = (
            not train
            and not self.is_initializing()
            and len(self.mlp) == 3
            and pallas_sa.sa_fused_enabled()
        )
        use_fused_train = (
            train
            and not self.is_initializing()
            and len(self.mlp) == 3
            and pallas_sa_train.sa_train_enabled()
        )
        if self.group_all:
            if use_fused_train:
                full = jnp.concatenate([xyz, feats], axis=-1)
                pooled, stats = pallas_sa_train.groupall_train_fused(
                    full, self._raw_dense_bn(),
                    pallas_sa_train.sa_train_interpret(),
                )
                self._update_bn_running(stats)
                new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
                return new_xyz, pooled
            if use_fused:
                weights = pallas_sa.folded_sa_weights(
                    self.variables["params"], self.variables["batch_stats"]
                )
                full = jnp.concatenate([xyz, feats], axis=-1)  # (B, N, 3+C)
                interp = pallas_sa.sa_interpret()
                pooled = jax.vmap(
                    lambda f: pallas_sa.mlp_maxpool(f, weights, interpret=interp)
                )(full)
                new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
                return new_xyz, pooled
            grouped = jnp.concatenate([xyz, feats], axis=-1)[:, None]  # (B,1,N,3+C)
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        else:
            centers = jax.vmap(lambda p: furthest_point_sampling(p, self.npoint))(xyz)
            group_idx = jax.vmap(
                lambda c, p: ball_query(p[c], p, self.radius, self.nsample)
            )(centers, xyz)
            if use_fused_train:
                new_xyz = jax.vmap(lambda p, c: jnp.take(p, c, axis=0))(
                    xyz, centers
                )
                full = jnp.concatenate([xyz, feats], axis=-1)
                cpad = jnp.zeros(
                    (xyz.shape[0], self.npoint, full.shape[-1]), jnp.float32
                ).at[:, :, :3].set(new_xyz)
                pooled, stats = pallas_sa_train.sa_train_fused(
                    group_idx, full, cpad, self._raw_dense_bn(),
                    pallas_sa_train.sa_train_interpret(),
                )
                self._update_bn_running(stats)
                return new_xyz, pooled
            if use_fused:
                weights = pallas_sa.folded_sa_weights(
                    self.variables["params"], self.variables["batch_stats"]
                )
                new_xyz = jax.vmap(lambda p, c: jnp.take(p, c, axis=0))(
                    xyz, centers
                )
                full = jnp.concatenate([xyz, feats], axis=-1)
                cpad = jnp.zeros(
                    (xyz.shape[0], self.npoint, full.shape[-1]), jnp.float32
                ).at[:, :, :3].set(new_xyz)
                interp = pallas_sa.sa_interpret()
                pooled = jax.vmap(
                    lambda i, f, c: pallas_sa.sa_gather_mlp(
                        i, f, c, weights, interpret=interp
                    )
                )(group_idx, full, cpad)
                return new_xyz, pooled
            new_xyz, grouped = jax.vmap(group_points)(xyz, feats, centers, group_idx)

        h = grouped
        for ch in self.mlp:
            h = nn.Dense(
                ch, kernel_init=nn.initializers.kaiming_normal(),
                dtype=self.dtype,
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=jnp.float32,
            )(h)
            h = nn.relu(h)
        return new_xyz, jnp.max(h, axis=-2)  # max over group members


class PointNetEncoder(nn.Module):
    """Full trunk: 3 SA levels + BN MLP head -> 512-d feature."""

    in_channels: int = 4
    nclusters: int = 32
    radius: float = 0.02
    scale: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pc, train: bool = True):
        """pc (B, N, C): columns 0:3 xyz, rest extra channels."""
        s = self.scale
        dt = self.dtype
        xyz = pc[..., :3]
        feats = pc
        xyz, feats = SetAbstraction(
            self.nclusters, self.radius, 64, (64 * s, 64 * s, 128 * s), dtype=dt
        )(xyz, feats, train)
        xyz, feats = SetAbstraction(
            32, 0.04, 128, (128 * s, 128 * s, 256 * s), dtype=dt
        )(xyz, feats, train)
        _, feats = SetAbstraction(
            0, 0.0, 0, (256 * s, 256 * s, 512 * s), group_all=True, dtype=dt
        )(xyz, feats, train)
        h = feats[:, 0]  # (B, 512s)
        h = nn.Dense(1024 * s, dtype=dt)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Dense(512 * s, dtype=dt)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        return h


class PointNetFeature(nn.Module):
    """Policy + value encoders with the reference's input slicing.

    Input point state is (B, 4, 1030): channel 3 flags the 6 hand anchor
    points; the first 6 *points* are the hand anchors
    (reference: env/panda_scene.py:1195-1200). Like the reference
    (reference: core/networks.py:232-248):
    - both encoders drop the 6 hand anchor points,
    - the policy encoder sees 4 channels (xyz + flag),
    - the value encoder sees 4 + action channels (10 when the 6-d action
      is tiled channel-wise).
    """

    policy_in: int = 4
    value_in: int = 10
    nclusters: int = 32
    radius: float = 0.02
    scale: int = 1
    num_hand_points: int = 6
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = PointNetEncoder(
            self.policy_in, self.nclusters, self.radius, self.scale,
            dtype=self.dtype, name="encoder"
        )
        self.value_encoder = PointNetEncoder(
            self.value_in, self.nclusters, self.radius, self.scale,
            dtype=self.dtype, name="value_encoder"
        )

    def _prep(self, point_state, channels):
        # (B, C, N) -> drop hand anchor points -> (B, N', C_keep)
        pc = point_state[:, :channels, self.num_hand_points:]
        return jnp.swapaxes(pc, -1, -2)

    def __call__(self, point_state, action=None, value: bool = False, train: bool = True):
        """point_state (B, 4, 1030); action (B, 6) for the value path."""
        if value:
            pc = point_state
            if action is not None:
                tiled = jnp.broadcast_to(
                    action[:, :, None], action.shape + (point_state.shape[-1],)
                )
                pc = jnp.concatenate([pc, tiled], axis=1)
            return self.value_encoder(self._prep(pc, self.value_in), train)
        return self.encoder(self._prep(point_state, self.policy_in), train)


class GoalFeature(nn.Module):
    """Grasp-pose prediction encoder (reference: core/networks.py:150-178).

    Consumes an object cloud (B, N, 3) and emits a normalized
    quaternion+translation grasp and a confidence.
    """

    nclusters: int = 128
    radius: float = 0.02
    scale: int = 1

    @nn.compact
    def __call__(self, pc, train: bool = True):
        z = PointNetEncoder(3, self.nclusters, self.radius, self.scale)(pc, train)
        q = nn.Dense(4)(z)
        t = nn.Dense(3)(z)
        conf = nn.Dense(1)(z)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        return jnp.concatenate([q, t], axis=-1), jax.nn.sigmoid(conf[..., 0])
