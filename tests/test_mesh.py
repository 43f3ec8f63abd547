"""Data-parallel mesh: sharded update == single-device update.

Verifies the GSPMD wiring in parallel/mesh.py on the conftest's 8
virtual CPU devices (the TPU-native replacement for the reference's
DataParallel learner, reference: core/utils.py:202,
core/train_online.py:426-429).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gaddpg_tpu.agents.config import AgentConfig
from gaddpg_tpu.agents.ddpg import make_ddpg_update
from gaddpg_tpu.agents.state import create_agent_state
from gaddpg_tpu.parallel.mesh import make_mesh, make_sharded_update, replicate


NPTS = 70


def _batch(batch_size, key):
    ks = jax.random.split(key, 3)
    ps = jax.random.normal(ks[0], (batch_size, 4, NPTS)) * 0.05
    ps = ps.at[:, 3, :].set(0.0).at[:, 3, :6].set(1.0)
    goal = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0.1]), (batch_size, 1))
    return {
        "point_state": ps,
        "next_point_state": ps,
        "action": jax.random.uniform(ks[1], (batch_size, 6), minval=-0.05, maxval=0.05),
        "expert_action": jax.random.uniform(
            ks[2], (batch_size, 6), minval=-0.05, maxval=0.05
        ),
        "reward": jnp.zeros((batch_size,)),
        "return": jnp.ones((batch_size,)),
        "terminal": jnp.zeros((batch_size,)),
        "time": jnp.full((batch_size,), 10.0),
        "goal": goal,
        "next_goal": goal,
        "expert_flags": jnp.ones((batch_size,)),
        "perturb_flags": jnp.zeros((batch_size,)),
    }


class TestMakeMesh:
    def test_mesh_uses_requested_devices(self):
        mesh = make_mesh(8)
        assert mesh.devices.size == 8

    def test_raises_when_too_few_devices(self):
        with pytest.raises(ValueError, match="8 JAX device"):
            make_mesh(len(jax.devices()) + 1)


class TestShardedUpdateEquivalence:
    def test_sharded_matches_single_device(self):
        n_dev = 8
        batch = 2 * n_dev
        cfg = AgentConfig(batch_size=batch)
        key = jax.random.PRNGKey(0)
        state_a = create_agent_state(key, cfg, npoints=NPTS)
        state_b = create_agent_state(key, cfg, npoints=NPTS)

        data = _batch(batch, jax.random.PRNGKey(1))
        upd_key = jax.random.PRNGKey(2)

        update = make_ddpg_update(cfg)
        ref_state, ref_metrics = jax.jit(update)(state_a, data, upd_key)

        mesh = make_mesh(n_dev)
        sharded_update = make_sharded_update(update, mesh)
        sh_state, sh_metrics = sharded_update(state_b, data, upd_key)

        for k in ref_metrics:
            np.testing.assert_allclose(
                np.asarray(sh_metrics[k]), np.asarray(ref_metrics[k]),
                rtol=1e-3, atol=1e-4, err_msg=f"metric {k}",
            )
        ref_leaves = jax.tree_util.tree_leaves(
            (ref_state.feat_params, ref_state.policy_params,
             ref_state.critic_params, ref_state.policy_target,
             ref_state.critic_target)
        )
        sh_leaves = jax.tree_util.tree_leaves(
            (sh_state.feat_params, sh_state.policy_params,
             sh_state.critic_params, sh_state.policy_target,
             sh_state.critic_target)
        )
        assert len(ref_leaves) == len(sh_leaves)
        # Adam normalizes g/sqrt(g^2): for near-zero gradients a
        # reduction-order epsilon can flip a step's sign, so params can
        # differ by up to ~2*lr elementwise. Bound by the step size.
        for a, b in zip(ref_leaves, sh_leaves):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=0, atol=3e-3
            )

    def test_replicate_places_on_all_devices(self):
        mesh = make_mesh(4)
        x = replicate(mesh, jnp.ones((3, 3)))
        assert len(x.sharding.device_set) == 4
