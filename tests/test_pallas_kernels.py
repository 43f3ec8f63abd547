"""Pallas kernels (interpret mode) vs the XLA reference implementations."""

import numpy as np
import jax
import jax.numpy as jnp

from gaddpg_tpu.ops.pallas_kernels import (
    ball_query_pallas,
    fps_pallas,
    pallas_enabled,
    use_pallas,
)
from gaddpg_tpu.ops.sampling import ball_query, furthest_point_sampling


def cloud(n=256, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.05)


class TestPallasParity:
    def test_fps_matches_xla(self):
        xyz = cloud()
        a = np.asarray(fps_pallas(xyz, 32, interpret=True))
        b = np.asarray(furthest_point_sampling(xyz, 32))
        np.testing.assert_array_equal(a, b)

    def test_ball_query_matches_xla(self):
        xyz = cloud(seed=1)
        centers = xyz[np.asarray(furthest_point_sampling(xyz, 16))]
        a = np.asarray(ball_query_pallas(centers, xyz, 0.03, 24, interpret=True))
        b = np.asarray(ball_query(centers, xyz, 0.03, 24))
        np.testing.assert_array_equal(a, b)

    def test_ball_query_nsample_gt_hits(self):
        # sparse radius: padding semantics must match too
        xyz = cloud(seed=2)
        centers = xyz[:4]
        a = np.asarray(ball_query_pallas(centers, xyz, 0.005, 8, interpret=True))
        b = np.asarray(ball_query(centers, xyz, 0.005, 8))
        np.testing.assert_array_equal(a, b)

    def test_ball_query_nsample_gt_n(self):
        # SA2 shape: more group slots than points; pads with first hit
        xyz = cloud(n=32, seed=3)
        centers = xyz[:8]
        a = np.asarray(ball_query_pallas(centers, xyz, 0.04, 128, interpret=True))
        b = np.asarray(ball_query(centers, xyz, 0.04, 128))
        np.testing.assert_array_equal(a, b)

    def test_fps_vmap_parity(self):
        # the model calls FPS vmapped over the batch
        xyzs = jnp.stack([cloud(seed=s) for s in range(4)])
        a = np.asarray(jax.vmap(lambda p: fps_pallas(p, 32, interpret=True))(xyzs))
        b = np.asarray(jax.vmap(lambda p: furthest_point_sampling(p, 32))(xyzs))
        np.testing.assert_array_equal(a, b)

    def test_dispatch_guard(self):
        # on the CPU test platform, compiled pallas must not be selected
        assert use_pallas() is False
        assert pallas_enabled() is False
