"""Training-mode fused SA kernels (ops/pallas_sa_train.py).

Round-3 verdict item 2: the DDPG/BC update's hot loop must run through
the fused gather->MLP->maxpool path with gradients matching the XLA
path. Kernels run in interpret mode on the CPU test harness; the same
code compiles through Mosaic on TPU (bench.py probes + reports
`pallas_sa_train`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaddpg_tpu.models.pointnet import PointNetEncoder, SetAbstraction
from gaddpg_tpu.ops import pallas_sa_train as pst


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setenv("GADDPG_PALLAS_SA_TRAIN", "interpret")


@pytest.fixture
def xla_mode(monkeypatch):
    monkeypatch.setenv("GADDPG_PALLAS_SA", "0")
    monkeypatch.delenv("GADDPG_PALLAS_SA_TRAIN", raising=False)


def _mk_inputs(B=3, N=48, Cin=4, seed=0):
    k = jax.random.PRNGKey(seed)
    pc = jax.random.normal(k, (B, N, Cin)) * 0.05
    return pc


class TestKernelParity:
    def test_probe(self, interpret_mode):
        assert pst.sa_train_probe()

    def test_stats_match_xla(self, interpret_mode):
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 8)
        B, N, S, K, Cin = 2, 24, 4, 8, 5
        dims = (6, 6, 8)
        full = jax.random.normal(ks[0], (B, N, Cin))
        idx = jax.random.randint(ks[1], (B, S, K), 0, N)
        cpad = jnp.zeros((B, S, Cin)).at[:, :, :3].set(
            jax.random.normal(ks[2], (B, S, 3)) * 0.1)
        dense, c = [], Cin
        for i, d in enumerate(dims):
            dense.append((jax.random.normal(ks[3 + i], (c, d)) * 0.4,
                          jnp.zeros((d,)) + 0.01 * i,
                          jnp.ones((d,)) * 1.1, jnp.zeros((d,)) - 0.02))
            c = d
        dense = tuple(dense)
        out, stats = pst.sa_train_fused(idx, full, cpad, dense, True)
        ref, ref_stats = pst._xla_full(idx, full, cpad, dense)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        for (m, v), (rm, rv) in zip(stats, ref_stats):
            np.testing.assert_allclose(np.asarray(m), np.asarray(rm),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(v), np.asarray(rv),
                                       rtol=1e-4, atol=1e-6)


class TestModuleParity:
    """SetAbstraction module: fused-train vs XLA-train, both variants.

    SA-level parity is tight (~1e-4). Full-trunk outputs are NOT
    compared elementwise: the head BatchNorm divides by batch variances
    that are ~1e-4 at test batch sizes, amplifying benign 1e-5 kernel
    reorder noise ~150x (verified: SA outputs agree to 2e-5, the first
    head BN alone turns 1.5e-3 into 0.24). Grad parity is asserted at
    the SA level, where the custom-vjp backward is exactly the XLA
    recompute."""

    def _apply(self, sa, v, xyz, feats):
        (nx, f), ups = sa.apply(v, xyz, feats, train=True,
                                mutable=["batch_stats"])
        return nx, f, ups["batch_stats"]

    def test_sa_forward_and_running_stats_parity(
            self, interpret_mode, monkeypatch):
        pc = _mk_inputs(B=3, N=48)
        xyz, feats = pc[..., :3], pc
        for group_all in (False, True):
            sa = SetAbstraction(8, 0.02, 16, (6, 6, 8),
                                group_all=group_all)
            v = sa.init(jax.random.PRNGKey(1), xyz, feats, train=True)
            monkeypatch.setenv("GADDPG_PALLAS_SA_TRAIN", "0")
            nx_r, f_r, bs_r = self._apply(sa, v, xyz, feats)
            monkeypatch.setenv("GADDPG_PALLAS_SA_TRAIN", "interpret")
            nx_f, f_f, bs_f = self._apply(sa, v, xyz, feats)
            np.testing.assert_allclose(np.asarray(nx_f), np.asarray(nx_r),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_r),
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"group_all={group_all}")
            ref_leaves = dict(jax.tree_util.tree_leaves_with_path(bs_r))
            for path, leaf in jax.tree_util.tree_leaves_with_path(bs_f):
                np.testing.assert_allclose(
                    np.asarray(leaf), np.asarray(ref_leaves[path]),
                    rtol=1e-3, atol=1e-4, err_msg=str(path))

    def test_sa_grads_match_xla(self, interpret_mode, monkeypatch):
        pc = _mk_inputs(B=3, N=48, seed=3)
        xyz, feats = pc[..., :3], pc
        for group_all in (False, True):
            sa = SetAbstraction(8, 0.02, 16, (6, 6, 8),
                                group_all=group_all)
            v = sa.init(jax.random.PRNGKey(1), xyz, feats, train=True)
            params, bstats = v["params"], v["batch_stats"]

            def loss(p, x):
                (_, f), _ = sa.apply(
                    {"params": p, "batch_stats": bstats}, x[..., :3], x,
                    train=True, mutable=["batch_stats"])
                return jnp.sum(f * f)

            monkeypatch.setenv("GADDPG_PALLAS_SA_TRAIN", "0")
            l_ref, g_ref = jax.value_and_grad(loss)(params, pc)
            gp_ref = jax.grad(lambda x: loss(params, x))(pc)
            monkeypatch.setenv("GADDPG_PALLAS_SA_TRAIN", "interpret")
            l_fused, g_fused = jax.value_and_grad(loss)(params, pc)
            gp_fused = jax.grad(lambda x: loss(params, x))(pc)

            assert abs(float(l_fused) - float(l_ref)) < 1e-3 * max(
                abs(float(l_ref)), 1.0)
            # atol floor 5e-3: Dense BIAS grads are exact zeros in
            # infinite precision (BN mean-subtraction cancels the shift)
            # and both paths produce O(1e-3) f32 cancellation noise
            # around 0 -- in different summation orders
            ref_leaves = dict(jax.tree_util.tree_leaves_with_path(g_ref))
            for path, leaf in jax.tree_util.tree_leaves_with_path(g_fused):
                np.testing.assert_allclose(
                    np.asarray(leaf), np.asarray(ref_leaves[path]),
                    rtol=2e-3, atol=5e-3,
                    err_msg=f"group_all={group_all} {path}")
            np.testing.assert_allclose(np.asarray(gp_fused),
                                       np.asarray(gp_ref),
                                       rtol=2e-3, atol=5e-3)

    def test_trunk_runs_fused_and_finite(self, interpret_mode):
        # full PointNetEncoder through the fused train path: finite
        # output, finite grads, batch_stats updated for all levels
        enc = PointNetEncoder(in_channels=4, nclusters=8)
        pc = _mk_inputs(B=4, N=48, seed=7)
        v = enc.init(jax.random.PRNGKey(0), pc, train=True)

        def loss(p):
            out, ups = enc.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, pc,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)

        l, g = jax.value_and_grad(loss)(v["params"])
        assert np.isfinite(float(l))
        for path, leaf in jax.tree_util.tree_leaves_with_path(g):
            assert np.isfinite(np.asarray(leaf)).all(), path

    def test_eval_path_unaffected(self, xla_mode):
        # train=False still produces identical features with the train
        # kernels merely importable (no dispatch)
        enc = PointNetEncoder(in_channels=4, nclusters=8)
        pc = _mk_inputs(B=2, N=40, seed=5)
        variables = enc.init(jax.random.PRNGKey(0), pc, train=True)
        out = enc.apply(variables, pc, train=False)
        assert np.isfinite(np.asarray(out)).all()
