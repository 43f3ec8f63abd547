"""Point-cloud op semantics: FPS spread, ball-query radius/padding, resampling."""

import numpy as np
import jax
import jax.numpy as jnp

from gaddpg_tpu import ops


class TestFPS:
    def test_starts_at_zero_and_unique(self):
        rng = np.random.RandomState(0)
        xyz = jnp.array(rng.randn(256, 3))
        idx = np.asarray(ops.furthest_point_sampling(xyz, 32))
        assert idx[0] == 0
        assert len(np.unique(idx)) == 32

    def test_spreads_better_than_random(self):
        rng = np.random.RandomState(1)
        xyz = jnp.array(rng.rand(512, 3))
        idx = np.asarray(ops.furthest_point_sampling(xyz, 16))
        sel = np.asarray(xyz)[idx]
        rand_sel = np.asarray(xyz)[rng.choice(512, 16, replace=False)]

        def min_pairwise(a):
            d = np.linalg.norm(a[:, None] - a[None], axis=-1)
            np.fill_diagonal(d, np.inf)
            return d.min()

        assert min_pairwise(sel) > min_pairwise(rand_sel)

    def test_respects_valid_mask(self):
        xyz = jnp.concatenate([jnp.zeros((10, 3)), jnp.ones((10, 3)) * 100])
        valid = jnp.arange(20) < 10
        idx = np.asarray(ops.furthest_point_sampling(xyz, 8, valid=valid))
        assert np.all(idx < 10)


class TestBallQuery:
    def test_within_radius(self):
        rng = np.random.RandomState(2)
        xyz = jnp.array(rng.rand(256, 3) * 0.1)
        centers = xyz[:8]
        idx = np.asarray(ops.ball_query(centers, xyz, 0.03, 16))
        d = np.linalg.norm(np.asarray(centers)[:, None] - np.asarray(xyz)[idx], axis=-1)
        # every returned point within radius OR a pad duplicate of first hit
        assert (d < 0.03 + 1e-6).mean() > 0.99

    def test_pads_with_first_hit(self):
        # one point inside radius, rest far away
        xyz = jnp.concatenate([jnp.zeros((1, 3)), jnp.ones((63, 3))])
        centers = jnp.zeros((1, 3))
        idx = np.asarray(ops.ball_query(centers, xyz, 0.1, 8))
        assert np.all(idx == 0)

    def test_empty_ball_falls_back_to_nearest(self):
        xyz = jnp.ones((32, 3))
        centers = jnp.zeros((1, 3))
        idx = np.asarray(ops.ball_query(centers, xyz, 0.01, 4))
        assert idx.shape == (1, 4)
        assert np.all(idx >= 0) and np.all(idx < 32)


class TestRegularize:
    def test_downsample_exact_count_no_replacement(self):
        key = jax.random.PRNGKey(0)
        pc = jnp.arange(200, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
        out, idx = ops.regularize_point_count(key, pc, 64)
        assert out.shape == (64, 4)
        assert len(np.unique(np.asarray(idx))) == 64  # without replacement

    def test_upsample_with_replacement(self):
        key = jax.random.PRNGKey(1)
        pc = jnp.arange(10, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
        out, _ = ops.regularize_point_count(key, pc, 32)
        assert out.shape == (32, 3)
        assert set(np.unique(np.asarray(out[:, 0]))) <= set(range(10))

    def test_valid_mask_only(self):
        key = jax.random.PRNGKey(2)
        pc = jnp.arange(100, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
        valid = jnp.arange(100) < 20
        out, _ = ops.regularize_point_count(key, pc, 50, valid=valid)
        assert np.all(np.asarray(out[:, 0]) < 20)
