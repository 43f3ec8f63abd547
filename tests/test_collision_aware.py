"""Collision-aware imitation: collide_future backfill, demo
discounting, and the collision-prediction aux head.

The reference logs robot-obstacle collision alongside success
(reference: env/panda_scene.py:1078-1095,
core/train_test_offline.py:258-302) but never trains on it; these
losses close the measured collision gap of round-2 (clutter policy
collision rate ~2.3x its expert's).
"""

import jax
import jax.numpy as jnp
import numpy as np
from gaddpg_tpu import replay
from gaddpg_tpu.agents.config import AgentConfig
from gaddpg_tpu.agents.bc import make_bc_update
from gaddpg_tpu.agents.losses import collision_bce, pose_bc_loss
from gaddpg_tpu.agents.state import create_agent_state


def _episode(T, P=16, collide_steps=(), n_valid=None):
    n_valid = T if n_valid is None else n_valid
    ep = {
        "point_state": jnp.zeros((T, 4, P)),
        "action": jnp.zeros((T, 6)),
        "expert_action": jnp.zeros((T, 6)),
        "reward": jnp.zeros((T,)).at[n_valid - 1].set(1.0),
        "terminal": jnp.zeros((T,)).at[n_valid - 1].set(1.0),
        "timestep": jnp.arange(T, dtype=jnp.float32),
        "state_pose": jnp.tile(jnp.eye(4), (T, 1, 1)),
        "goal": jnp.zeros((T, 7)).at[:, 0].set(1.0),
        "expert_flags": jnp.ones((T,)),
        "perturb_flags": jnp.zeros((T,)),
        "collide": jnp.zeros((T,)).at[jnp.array(collide_steps, int)].set(1.0)
        if collide_steps else jnp.zeros((T,)),
        "grasp": jnp.zeros((T,)),
        "target_idx": jnp.zeros((T,)),
    }
    valid = jnp.arange(T) < n_valid
    return ep, valid


def test_collide_future_backfill():
    """collide_future[i] = any collide in [i, episode end]."""
    buf = replay.create_buffer(64, num_points=16)
    ep, valid = _episode(8, collide_steps=(5,))
    buf = replay.add_episode(buf, ep, valid)
    fut = np.asarray(buf.collide_future[:8])
    np.testing.assert_allclose(fut, [1, 1, 1, 1, 1, 1, 0, 0])
    col = np.asarray(buf.collide[:8])
    np.testing.assert_allclose(col, [0, 0, 0, 0, 0, 1, 0, 0])


def test_collide_future_clean_episode_and_invalid_tail():
    buf = replay.create_buffer(64, num_points=16)
    ep, valid = _episode(8, collide_steps=(7,), n_valid=6)
    # collision at t=7 falls OUTSIDE the valid range -> no future flag
    buf = replay.add_episode(buf, ep, valid)
    assert float(buf.collide_future[:6].max()) == 0.0


def test_sample_returns_collide_future():
    buf = replay.create_buffer(64, num_points=16)
    ep, valid = _episode(8, collide_steps=(2,))
    buf = replay.add_episode(buf, ep, valid)
    batch = replay.sample(buf, jax.random.PRNGKey(0), 16, episode_max_len=0)
    assert "collide_future" in batch and "collide" in batch
    assert batch["collide_future"].shape == (16,)


def test_collision_discount_zeroes_tainted_demo_gradient():
    """With discount=1.0, the BC loss ignores collision-bound expert
    transitions entirely."""
    pi = jnp.zeros((4, 6))
    expert = jnp.ones((4, 6)) * 0.05
    w_all = jnp.ones((4,))
    w_none = jnp.zeros((4,))
    full = pose_bc_loss(pi, expert, w_all)
    assert float(full) > 0
    assert float(pose_bc_loss(pi, expert, w_none)) == 0.0
    # half the batch discounted -> same mean (identical rows)
    w_half = jnp.array([1.0, 0.0, 1.0, 0.0])
    np.testing.assert_allclose(
        float(pose_bc_loss(pi, expert, w_half)), float(full), rtol=1e-6
    )


def test_collision_bce_matches_reference_form():
    logit = jnp.array([-2.0, 0.0, 3.0])
    target = jnp.array([0.0, 1.0, 1.0])
    expected = np.mean(
        -(target * np.log(1 / (1 + np.exp(-logit)))
          + (1 - target) * np.log(1 - 1 / (1 + np.exp(-logit))))
    )
    np.testing.assert_allclose(float(collision_bce(logit, target)), expected,
                               rtol=1e-5)


def test_collision_bce_gradient_stops_at_clip():
    """Saturation-drift guard (round-4 collapse root cause): with a
    positive present the loss is live inside the clip bound and its
    gradient is exactly zero past it, so Adam's normalized steps cannot
    keep pushing the shared encoder in a constant direction forever."""
    target = jnp.array([1.0, 0.0, 0.0, 0.0])
    g_inside = jax.grad(
        lambda z: collision_bce(z, target))(jnp.full((4,), -5.0))
    g_past = jax.grad(
        lambda z: collision_bce(z, target))(jnp.full((4,), -9.0))
    assert float(jnp.abs(g_inside).max()) > 0.0
    np.testing.assert_allclose(np.asarray(g_past), 0.0)


def test_collision_bce_gates_positive_free_batches():
    """One-class guard: run bc_proc_r4e showed the clip alone does NOT
    stop the drift (the logit equilibrates just inside the bound where
    a tiny constant-sign gradient + Adam normalization still walks the
    shared encoder). On an all-negative batch -- the collision-filtered
    demo buffers have literally zero positive labels -- both the loss
    and its gradient must be exactly zero."""
    target = jnp.zeros((4,))
    logit = jnp.array([-5.0, -2.0, 0.0, 3.0])
    assert float(collision_bce(logit, target)) == 0.0
    g = jax.grad(lambda z: collision_bce(z, target))(logit)
    np.testing.assert_allclose(np.asarray(g), 0.0)
    # masked variant: a positive hidden behind the mask must not unlock
    # the gate
    target2 = jnp.array([1.0, 0.0, 0.0, 0.0])
    mask = jnp.array([0.0, 1.0, 1.0, 1.0])
    assert float(collision_bce(logit, target2, mask)) == 0.0
    # with a LIVE positive the gate is a no-op
    assert float(collision_bce(logit, target2)) > 0.0


def test_bc_update_with_collision_losses_steps():
    """The BC update runs with both collision knobs on, produces finite
    losses, and the collision logit learns the obvious constant."""
    cfg = AgentConfig(
        batch_size=8, collision_demo_discount=0.5, collision_aux_weight=0.5,
        hidden_size=32,
    )
    key = jax.random.PRNGKey(0)
    state = create_agent_state(key, cfg, npoints=32)
    update = jax.jit(make_bc_update(cfg), donate_argnums=(0,))

    ps = jax.random.normal(key, (8, 4, 32)) * 0.05
    batch = {
        "point_state": ps,
        "time": jnp.full((8,), 5.0),
        "expert_action": jnp.zeros((8, 6)).at[:, 0].set(0.02),
        "goal": jnp.zeros((8, 7)).at[:, 0].set(1.0),
        "return": jnp.ones((8,)),
        "expert_flags": jnp.ones((8,)),
        "perturb_flags": jnp.zeros((8,)),
        "collide_future": jnp.ones((8,)),  # all tainted
        "collide": jnp.zeros((8,)),
    }
    m0 = None
    for i in range(10):
        state, m = update(state, batch, jax.random.fold_in(key, i))
        assert all(np.isfinite(float(v)) for v in m.values()), m
        if m0 is None:
            m0 = m
    # BCE against the constant-1 target must decrease
    assert float(m["collision_aux_loss"]) < float(m0["collision_aux_loss"])
