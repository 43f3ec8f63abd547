"""Agent updates: loss math vs hand-rolled formulas, BC overfit, DDPG step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaddpg_tpu.agents import (
    AgentConfig,
    create_agent_state,
    goal_pred_loss,
    pose_bc_loss,
    smooth_l1,
)
from gaddpg_tpu.agents.bc import make_bc_update
from gaddpg_tpu.agents.ddpg import make_ddpg_update, make_select_action, mix_ratios

NPTS = 262  # small cloud for fast CPU tests (6 hand + 256 scene points)


def tiny_cfg():
    return AgentConfig(batch_size=8)


def make_batch(key, batch=8, npts=NPTS):
    ks = jax.random.split(key, 8)
    ps = jax.random.normal(ks[0], (batch, 4, npts)) * 0.05
    ps = ps.at[:, 3, :].set(0.0).at[:, 3, :6].set(1.0)
    goal = jnp.concatenate(
        [jnp.tile(jnp.array([1.0, 0, 0, 0]), (batch, 1)),
         jax.random.normal(ks[2], (batch, 3)) * 0.1], axis=-1
    )
    return {
        "point_state": ps,
        "next_point_state": ps,
        "action": jax.random.uniform(ks[1], (batch, 6), minval=-0.05, maxval=0.05),
        "expert_action": jax.random.uniform(ks[3], (batch, 6), minval=-0.05, maxval=0.05),
        "reward": jnp.zeros((batch,)),
        "return": jnp.ones((batch,)),
        "terminal": jnp.zeros((batch,)),
        "time": jnp.full((batch,), 10.0),
        "goal": goal,
        "next_goal": goal,
        "expert_flags": jnp.ones((batch,)),
        "perturb_flags": jnp.zeros((batch,)),
    }


class TestLosses:
    def test_pose_bc_loss_zero_for_identical(self):
        a = jnp.array([[0.01, 0.02, 0.0, 0.1, -0.1, 0.05]] * 4)
        assert float(pose_bc_loss(a, a)) < 1e-7

    def test_goal_pred_loss_zero_for_identical(self):
        qt = jnp.array([[1.0, 0, 0, 0, 0.1, 0.2, 0.3]] * 4)
        assert float(goal_pred_loss(qt, qt)) < 1e-7

    def test_pose_bc_loss_manual(self):
        # pure translation offset: every control point moves by delta,
        # loss = mean over points of sum |delta_xyz|
        pred = jnp.zeros((2, 6))
        tgt = jnp.zeros((2, 6)).at[:, 0].set(0.02)
        expected = 0.02
        np.testing.assert_allclose(float(pose_bc_loss(pred, tgt)), expected, atol=1e-6)

    def test_masked(self):
        a = jnp.zeros((4, 6))
        b = jnp.zeros((4, 6)).at[:, 0].set(1.0)
        mask = jnp.array([True, True, False, False])
        full = float(pose_bc_loss(a, b))
        half = float(pose_bc_loss(a, b, mask))
        np.testing.assert_allclose(full, half, atol=1e-6)
        none = float(pose_bc_loss(a, b, jnp.zeros(4, bool)))
        assert none == 0.0

    def test_smooth_l1_matches_torch_formula(self):
        x = jnp.array([0.3, 2.0, -3.0])
        y = jnp.zeros(3)
        expected = np.mean([0.5 * 0.09, 1.5, 2.5])
        np.testing.assert_allclose(float(smooth_l1(x, y)), expected, atol=1e-6)


class TestSchedules:
    def test_mix_ratio_progression(self):
        cfg = tiny_cfg()
        mv0, mp0 = mix_ratios(cfg, jnp.asarray(0))
        assert float(mp0) == pytest.approx(0.1)
        mv1, mp1 = mix_ratios(cfg, jnp.asarray(10000))
        assert float(mp1) == pytest.approx(0.2)
        _, mp2 = mix_ratios(cfg, jnp.asarray(200000))
        assert float(mp2) == pytest.approx(0.2)  # capped


class TestBC:
    def test_overfits_tiny_batch(self):
        cfg = tiny_cfg()
        key = jax.random.PRNGKey(0)
        state = create_agent_state(key, cfg, npoints=NPTS)
        update = jax.jit(make_bc_update(cfg), donate_argnums=(0,))
        batch = make_batch(jax.random.PRNGKey(1))
        losses = []
        for i in range(60):
            state, metrics = update(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["bc_loss"]))
        assert losses[-1] < losses[0] * 0.5, f"BC did not overfit: {losses[::10]}"

    def test_update_step_increments(self):
        cfg = tiny_cfg()
        state = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=NPTS)
        update = make_bc_update(cfg)
        state, _ = update(state, make_batch(jax.random.PRNGKey(1)), jax.random.PRNGKey(2))
        assert int(state.update_step) == 1


class TestDDPG:
    def test_single_update_finite(self):
        cfg = tiny_cfg()
        state = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=NPTS)
        update = jax.jit(make_ddpg_update(cfg), donate_argnums=(0,))
        batch = make_batch(jax.random.PRNGKey(1))
        state, metrics = update(state, batch, jax.random.PRNGKey(2))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        assert int(state.update_step) == 1

    def test_critic_and_encoder_params_move(self):
        cfg = tiny_cfg()
        state0 = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=NPTS)
        update = jax.jit(make_ddpg_update(cfg))
        batch = make_batch(jax.random.PRNGKey(1))
        state1, _ = update(state0, batch, jax.random.PRNGKey(2))

        def changed(a, b):
            return any(
                not np.allclose(np.asarray(x), np.asarray(y))
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )

        assert changed(state0.critic_params, state1.critic_params)
        assert changed(state0.policy_params, state1.policy_params)
        assert changed(state0.feat_params["encoder"], state1.feat_params["encoder"])
        assert changed(
            state0.feat_params["value_encoder"], state1.feat_params["value_encoder"]
        )

    def test_target_updates_slow(self):
        cfg = tiny_cfg()
        state0 = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=NPTS)
        update = jax.jit(make_ddpg_update(cfg))
        state1, _ = update(state0, make_batch(jax.random.PRNGKey(1)), jax.random.PRNGKey(2))
        # tau = 1e-4: targets move but barely
        t0 = jax.tree_util.tree_leaves(state0.policy_target)
        t1 = jax.tree_util.tree_leaves(state1.policy_target)
        max_delta = max(np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in zip(t0, t1))
        assert 0 < max_delta < 1e-2

    def test_select_action_bounds_and_noise(self):
        cfg = tiny_cfg()
        state = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=NPTS)
        sel = jax.jit(make_select_action(cfg), static_argnames=("explore",))
        ps = make_batch(jax.random.PRNGKey(1))["point_state"]
        t = jnp.full((8,), 5.0)
        a1, aux = sel(state, ps, t, jax.random.PRNGKey(3), 0.0, False)
        a2, _ = sel(state, ps, t, jax.random.PRNGKey(3), 1.0, True)
        assert a1.shape == (8, 6)
        assert aux.shape == (8, 7)
        assert not np.allclose(np.asarray(a1), np.asarray(a2))
        high = np.array([0.06, 0.06, 0.06, np.pi / 6, np.pi / 6, np.pi / 6])
        assert np.all(np.abs(np.asarray(a1)) <= high + 1e-5)
