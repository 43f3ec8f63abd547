"""Model shapes, invariances, and head semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from gaddpg_tpu import models


def make_point_state(key, batch=2, npts=1030):
    pc = jax.random.normal(key, (batch, 4, npts)) * 0.05
    pc = pc.at[:, 3, :].set(0.0)
    pc = pc.at[:, 3, :6].set(1.0)  # hand anchor flag
    return pc


class TestPointNetFeature:
    def setup_method(self):
        self.model = models.PointNetFeature()
        key = jax.random.PRNGKey(0)
        pc = make_point_state(key)
        v_pol = self.model.init(key, pc, train=False)
        v_val = self.model.init(
            key, pc, action=jnp.zeros((pc.shape[0], 6)), value=True, train=False
        )
        self.vars_ = {
            "params": {**v_val["params"], **v_pol["params"]},
            "batch_stats": {**v_val["batch_stats"], **v_pol["batch_stats"]},
        }

    def test_policy_feature_shape(self):
        pc = make_point_state(jax.random.PRNGKey(1), batch=3)
        out = self.model.apply(self.vars_, pc, train=False)
        assert out.shape == (3, 512)

    def test_value_feature_with_action(self):
        pc = make_point_state(jax.random.PRNGKey(2), batch=3)
        act = jnp.zeros((3, 6))
        out = self.model.apply(self.vars_, pc, action=act, value=True, train=False)
        assert out.shape == (3, 512)

    def test_action_changes_value_feature_only(self):
        pc = make_point_state(jax.random.PRNGKey(3), batch=2)
        a1, a2 = jnp.zeros((2, 6)), jnp.ones((2, 6)) * 0.05
        v1 = self.model.apply(self.vars_, pc, action=a1, value=True, train=False)
        v2 = self.model.apply(self.vars_, pc, action=a2, value=True, train=False)
        assert not np.allclose(np.asarray(v1), np.asarray(v2))

    def test_train_mode_updates_batch_stats(self):
        pc = make_point_state(jax.random.PRNGKey(4))
        out, new_vars = self.model.apply(
            self.vars_, pc, train=True, mutable=["batch_stats"]
        )
        leaves_old = jax.tree_util.tree_leaves(self.vars_["batch_stats"])
        leaves_new = jax.tree_util.tree_leaves(new_vars["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_old, leaves_new)
        )
        assert changed


class TestHeads:
    def test_policy_sample_bounds(self):
        pol = models.GaussianPolicy()
        key = jax.random.PRNGKey(0)
        state = jax.random.normal(key, (8, 513))
        params = pol.init(key, state)
        mean, logp, action, extra = pol.apply(
            params, state, key, method=pol.sample
        )
        high = np.asarray(models.TASK6D_HIGH)
        assert np.all(np.abs(np.asarray(action)) <= high + 1e-6)
        assert np.all(np.abs(np.asarray(mean)) <= high + 1e-6)
        # aux quaternion normalized
        qn = np.linalg.norm(np.asarray(extra[:, :4]), axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-5)
        assert logp.shape == (8, 1)

    def test_policy_deterministic_without_key(self):
        pol = models.GaussianPolicy()
        key = jax.random.PRNGKey(1)
        state = jax.random.normal(key, (4, 513))
        params = pol.init(key, state)
        m1, _, a1, _ = pol.apply(params, state, None, method=pol.sample)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(a1), atol=1e-6)

    def test_qnetwork_twin_outputs_differ(self):
        q = models.QNetwork()
        key = jax.random.PRNGKey(2)
        state = jax.random.normal(key, (8, 513))
        params = q.init(key, state)
        q1, q2, aux = q.apply(params, state)
        assert q1.shape == (8, 1) and q2.shape == (8, 1)
        assert not np.allclose(np.asarray(q1), np.asarray(q2))
        qn = np.linalg.norm(np.asarray(aux[:, :4]), axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-5)


class TestResNet:
    def test_shapes(self):
        net = models.ResNet18Feature()
        key = jax.random.PRNGKey(0)
        img = jax.random.uniform(key, (2, 5, 112, 112))
        params = net.init(key, img, train=False)
        out = net.apply(params, img, train=False)
        assert out.shape == (2, 512)


class TestBf16Trunk:
    def test_bf16_forward_close_to_f32_and_bc_update_finite(self):
        # compute_dtype="bfloat16" runs the grouped MLPs on the MXU at
        # 2x on real TPUs; params/BN stay f32, so outputs must track the
        # f32 trunk closely and the BC update must stay finite
        import jax
        import jax.numpy as jnp
        import numpy as np

        from gaddpg_tpu.agents.bc import make_bc_update
        from gaddpg_tpu.agents.config import AgentConfig
        from gaddpg_tpu.agents.state import create_agent_state

        key = jax.random.PRNGKey(0)
        batch = 8
        npts = 1030
        ks = jax.random.split(key, 4)
        ps = jax.random.normal(ks[0], (batch, 4, npts)) * 0.05
        ps = ps.at[:, 3, :].set(0.0).at[:, 3, :6].set(1.0)
        goal = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0.1]), (batch, 1))
        data = {
            "point_state": ps,
            "next_point_state": ps,
            "action": jax.random.uniform(ks[1], (batch, 6), minval=-0.05, maxval=0.05),
            "expert_action": jax.random.uniform(ks[2], (batch, 6), minval=-0.05, maxval=0.05),
            "reward": jnp.zeros((batch,)),
            "return": jnp.ones((batch,)),
            "terminal": jnp.zeros((batch,)),
            "time": jnp.full((batch,), 10.0),
            "goal": goal,
            "next_goal": goal,
            "expert_flags": jnp.ones((batch,)),
            "perturb_flags": jnp.zeros((batch,)),
        }
        losses = {}
        for dt in ("float32", "bfloat16"):
            cfg = AgentConfig(batch_size=batch, compute_dtype=dt)
            state = create_agent_state(jax.random.PRNGKey(1), cfg, npoints=npts)
            update = jax.jit(make_bc_update(cfg))
            state, metrics = update(state, data, ks[3])
            loss = float(metrics["bc_loss"])
            assert np.isfinite(loss), dt
            losses[dt] = loss
        assert abs(losses["bfloat16"] - losses["float32"]) < 0.2 * (
            abs(losses["float32"]) + 1e-3
        ), losses
