"""Fused Pallas contact-scan kernel vs the XLA lax.scan path.

The kernel (ops/pallas_physics.py) reimplements physics/fast.py's
substep in component form for the (8 envs x 128 contact lanes) VMEM
layout; this parity suite pins it op-for-op against the scan path on
contact-rich trajectories (interpret mode on CPU -- the compiled Mosaic
path is exercised on TPU backends by bench.py's dispatch report).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gaddpg_tpu.envs.assets import AssetSpec, build_library
from gaddpg_tpu.physics.fast import fast_physics_step
from gaddpg_tpu.physics.types import ArmState, BodyState, PhysicsParams, PhysicsState
from gaddpg_tpu.robot.panda import DEFAULT_JOINTS

P = PhysicsParams()


def make_states(n_envs=3):
    """Contact-rich batch: objects near the closing gripper + table."""
    lib = build_library([
        AssetSpec("box", "box", (0.05, 0.05, 0.10), 0.2),
        AssetSpec("cyl", "cylinder", (0.033, 0.10), 0.35),
    ])
    q = jnp.concatenate([DEFAULT_JOINTS, jnp.array([0.04, 0.04])])
    qs = jnp.tile(q, (n_envs, 1))
    tgt = qs.at[:, 1].add(0.08).at[:, 7:].set(0.0)
    pos = jnp.stack([
        jnp.array([0.55, 0.0, 0.0501]),
        jnp.array([0.50, 0.05, 0.0501]),
        jnp.array([0.58, -0.04, 0.0335]),
    ])[:n_envs]
    st = PhysicsState(
        arm=ArmState(q=qs, qd=jnp.zeros((n_envs, 7)), q_target=tgt),
        obj=BodyState(
            pos=pos,
            quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_envs, 1)),
            linvel=jnp.tile(jnp.array([0.05, -0.02, 0.0]), (n_envs, 1)),
            angvel=jnp.tile(jnp.array([0.0, 0.0, 0.3]), (n_envs, 1)),
        ),
        contact_force=jnp.zeros(n_envs),
        gripper_contact=jnp.zeros(n_envs, bool),
    )
    idx = jnp.array([0, 1, 0])[:n_envs]
    return st, lib.spheres[idx], lib.mass[idx], lib.inertia[idx]


class TestContactScanParity:
    def test_interpret_matches_xla_scan(self):
        st, sph, mass, inertia = make_states()
        ref = fast_physics_step(P, st, sph, mass, inertia, substeps=60,
                                scan_impl="xla")
        out = fast_physics_step(P, st, sph, mass, inertia, substeps=60,
                                scan_impl="interpret")
        for name, a, b, tol in [
            ("pos", ref.obj.pos, out.obj.pos, 2e-5),
            ("quat", ref.obj.quat, out.obj.quat, 2e-5),
            ("linvel", ref.obj.linvel, out.obj.linvel, 2e-4),
            ("angvel", ref.obj.angvel, out.obj.angvel, 2e-3),
            ("fingers", ref.arm.q[:, 7:9], out.arm.q[:, 7:9], 2e-5),
            ("arm_q", ref.arm.q[:, :7], out.arm.q[:, :7], 1e-6),
        ]:
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=tol,
                err_msg=f"pallas-vs-xla divergence in {name}",
            )
        np.testing.assert_array_equal(
            np.asarray(out.gripper_contact), np.asarray(ref.gripper_contact)
        )

    def test_free_fall_parity(self):
        """No contacts at all: pure integration path."""
        st, sph, mass, inertia = make_states(2)
        st = st.replace(obj=st.obj.replace(
            pos=st.obj.pos + jnp.array([0.0, 0.0, 2.0])
        ))
        ref = fast_physics_step(P, st, sph, mass, inertia, substeps=40,
                                scan_impl="xla")
        out = fast_physics_step(P, st, sph, mass, inertia, substeps=40,
                                scan_impl="interpret")
        np.testing.assert_allclose(
            np.asarray(out.obj.pos), np.asarray(ref.obj.pos), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.obj.linvel), np.asarray(ref.obj.linvel), atol=1e-5
        )

    def test_batch_padding_roundtrip(self):
        """B not a multiple of the env tile: padded lanes must not leak."""
        st, sph, mass, inertia = make_states(3)  # pads 3 -> 8
        out = fast_physics_step(P, st, sph, mass, inertia, substeps=10,
                                scan_impl="interpret")
        assert out.obj.pos.shape == (3, 3)
        assert np.all(np.isfinite(np.asarray(out.obj.pos)))
