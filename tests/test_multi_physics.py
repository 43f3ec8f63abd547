"""Multi-body physics (physics/multi.py): clutter bodies are dynamic.

Contracts (behavioral, like the rest of the physics suite):
- with clutter parked far away the target's trajectory equals the
  validated single-object fast path;
- settled clutter next to the target stays put;
- a moving target transfers momentum to clutter it hits (Newton's third
  law via the antisymmetric pair-force tensor);
- gripper-clutter penetration raises the clutter_hit event.
Reference behavior: PyBullet steps all scene bodies
(reference: env/panda_scene.py:354-387, 1078-1095).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaddpg_tpu.envs.assets import AssetSpec, build_library
from gaddpg_tpu.physics.fast import fast_physics_step, fk_hand_batched
from gaddpg_tpu.physics.multi import multi_physics_step
from gaddpg_tpu.physics.types import ArmState, BodyState, PhysicsParams, PhysicsState
from gaddpg_tpu.robot.panda import DEFAULT_JOINTS

P = PhysicsParams()


def make_lib():
    return build_library([
        AssetSpec("tgt_box", "box", (0.05, 0.05, 0.10), 0.2),
        AssetSpec("clut_box", "box", (0.06, 0.06, 0.08), 0.3),
    ])


def batched_phys(obj_pos, linvel=(0, 0, 0), q=None):
    if q is None:
        q = jnp.concatenate([DEFAULT_JOINTS, jnp.array([0.04, 0.04])])
    q = q[None]
    return PhysicsState(
        arm=ArmState(q=q, qd=jnp.zeros((1, 7)), q_target=q),
        obj=BodyState(
            pos=jnp.asarray(obj_pos, jnp.float32)[None],
            quat=jnp.array([[1.0, 0, 0, 0]]),
            linvel=jnp.asarray(linvel, jnp.float32)[None],
            angvel=jnp.zeros((1, 3)),
        ),
        contact_force=jnp.zeros(1),
        gripper_contact=jnp.zeros(1, bool),
    )


def clutter_bodies(positions):
    k = len(positions)
    return BodyState(
        pos=jnp.asarray(positions, jnp.float32)[None],
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, k, 1)),
        linvel=jnp.zeros((1, k, 3)),
        angvel=jnp.zeros((1, k, 3)),
    )


def pack_inputs(lib, tgt_idx, clut_idx):
    idx = jnp.asarray([[tgt_idx] + list(clut_idx)])          # (1, M)
    return (
        lib.spheres[idx], lib.coarse_spheres[idx],
        lib.mass[idx], lib.inertia[idx],
    )


class TestStepFastParity:
    """step.py (readable per-env) vs fast.py (batched SoA): CLAUDE.md's
    three-way alignment invariant, enforced numerically (advisor
    round-1 finding: the two duplicated friction implementations had no
    comparing test)."""

    def test_step_matches_fast(self):
        from gaddpg_tpu.physics.step import physics_step

        lib = make_lib()
        # contact-rich start: object on the table in front of a moving,
        # finger-closing arm so every force path (normal, friction
        # passes, torsional, stiction, servo) is exercised
        q = jnp.concatenate([DEFAULT_JOINTS, jnp.array([0.04, 0.04])])
        st = batched_phys([0.55, 0.0, 0.0501], linvel=[0.05, 0.0, 0.0], q=q)
        tgt = st.arm.q_target.at[:, 1].add(0.1).at[:, 7:].set(0.0)
        st = st.replace(arm=st.arm.replace(q_target=tgt))

        fast = fast_physics_step(
            P, st, lib.spheres[jnp.array([0])],
            lib.mass[jnp.array([0])], lib.inertia[jnp.array([0])],
            substeps=50,
        )
        st1 = jax.tree_util.tree_map(lambda x: x[0], st)
        slow = physics_step(
            P, st1, lib.spheres[0], lib.mass[0], lib.inertia[0],
            jnp.eye(4), substeps=50,
        )
        for name, a, b in [
            ("obj.pos", slow.obj.pos, fast.obj.pos[0]),
            ("obj.quat", slow.obj.quat, fast.obj.quat[0]),
            ("obj.linvel", slow.obj.linvel, fast.obj.linvel[0]),
            ("obj.angvel", slow.obj.angvel, fast.obj.angvel[0]),
            ("arm.q", slow.arm.q, fast.arm.q[0]),
            ("arm.qd", slow.arm.qd, fast.arm.qd[0]),
        ]:
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-5,
                err_msg=f"step-vs-fast divergence in {name}",
            )
        assert bool(slow.gripper_contact) == bool(fast.gripper_contact[0])


class TestMultiBody:
    def test_far_clutter_matches_fast_path(self):
        lib = make_lib()
        st = batched_phys([0.55, 0.0, 0.0501], linvel=[0.1, 0.0, 0.0])
        sph, coarse, mass, inertia = pack_inputs(lib, 0, [1, 1])
        clut = clutter_bodies([[5.0, 5.0, 5.0], [-5.0, 5.0, 5.0]])

        ref = fast_physics_step(
            P, st, lib.spheres[jnp.array([0])],
            lib.mass[jnp.array([0])], lib.inertia[jnp.array([0])],
        )
        out, _, hit = multi_physics_step(
            P, st, sph, coarse, mass, inertia, clut
        )
        np.testing.assert_allclose(
            np.asarray(out.obj.pos), np.asarray(ref.obj.pos), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.obj.linvel), np.asarray(ref.obj.linvel), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.arm.q), np.asarray(ref.arm.q), atol=1e-6
        )
        assert not bool(hit[0])

    def test_settled_clutter_stays_put(self):
        lib = make_lib()
        st = batched_phys([0.55, 0.0, 0.0501])
        sph, coarse, mass, inertia = pack_inputs(lib, 0, [1, 1])
        clut = clutter_bodies([[0.55, 0.12, 0.0401], [0.45, -0.10, 0.0401]])
        p0 = np.asarray(clut.pos)
        for _ in range(3):
            st, clut, _ = multi_physics_step(
                P, st, sph, coarse, mass, inertia, clut
            )
        drift = np.linalg.norm(np.asarray(clut.pos) - p0, axis=-1)
        assert drift.max() < 3e-3, drift

    def test_sustained_push_displaces_clutter(self):
        lib = make_lib()
        # bulldozer push: the target's forward velocity is replenished
        # each policy step (as an arm-driven shove would), so the clutter
        # box ahead of it must be plowed forward, overcoming its table
        # static friction (~2.4 N)
        st = batched_phys([0.565, 0.0, 0.0501], linvel=[0.5, 0.0, 0.0])
        sph, coarse, mass, inertia = pack_inputs(lib, 0, [1])
        clut = clutter_bodies([[0.63, 0.0, 0.0401]])
        x0 = float(clut.pos[0, 0, 0])
        for _ in range(10):
            lv = st.obj.linvel.at[:, 0].set(0.5)
            st = st.replace(obj=st.obj.replace(linvel=lv))
            st, clut, _ = multi_physics_step(
                P, st, sph, coarse, mass, inertia, clut
            )
        dx = float(clut.pos[0, 0, 0]) - x0
        assert dx > 8e-3, dx
        # nothing ejected: everything stays in the tabletop envelope
        assert float(jnp.abs(clut.pos[0, 0, 2])) < 0.5
        assert float(jnp.abs(st.obj.pos[0, 2])) < 0.5
        assert float(jnp.linalg.norm(clut.linvel)) < P.max_linvel

    def test_free_space_x_momentum_conserved(self):
        lib = make_lib()
        # collision high above the table: pair forces are the only x-axis
        # coupling, and they are antisymmetric by construction
        st = batched_phys([0.50, 0.0, 2.0], linvel=[0.8, 0.0, 0.0])
        sph, coarse, mass, inertia = pack_inputs(lib, 0, [1])
        clut = BodyState(
            pos=jnp.array([[[0.58, 0.0, 2.0]]]),
            quat=jnp.array([[[1.0, 0, 0, 0]]]),
            linvel=jnp.zeros((1, 1, 3)),
            angvel=jnp.zeros((1, 1, 3)),
        )
        m_t, m_c = float(lib.mass[0]), float(lib.mass[1])
        px0 = m_t * 0.8
        st, clut, _ = multi_physics_step(
            P, st, sph, coarse, mass, inertia, clut
        )
        px1 = m_t * float(st.obj.linvel[0, 0]) + m_c * float(clut.linvel[0, 0, 0])
        assert abs(px1 - px0) / px0 < 0.03, (px0, px1)
        # and momentum actually moved between the bodies
        assert float(clut.linvel[0, 0, 0]) > 0.05

    def test_overlap_relaxes_without_ejection(self):
        lib = make_lib()
        # spawn the pair 2 cm interpenetrated: the pair impulse cap must
        # relax the overlap gently instead of firing them apart
        st = batched_phys([0.55, 0.0, 0.0501])
        sph, coarse, mass, inertia = pack_inputs(lib, 0, [1])
        clut = clutter_bodies([[0.585, 0.0, 0.0401]])
        for _ in range(4):
            st, clut, _ = multi_physics_step(
                P, st, sph, coarse, mass, inertia, clut
            )
            assert float(jnp.linalg.norm(st.obj.linvel)) < 0.5
            assert float(jnp.linalg.norm(clut.linvel)) < 0.5
        # they must have pushed apart (or at least not sunk deeper)
        gap = float(clut.pos[0, 0, 0] - st.obj.pos[0, 0])
        assert gap >= 0.035 - 1e-3, gap
        assert float(st.obj.pos[0, 2]) < 0.3
        assert float(clut.pos[0, 0, 2]) < 0.3

    def test_stacked_clutter_holds(self):
        # clutter box stacked ON the target box (object-object support,
        # not the table): must settle and HOLD -- no creep, no spin-off
        # -- for 5 policy steps (0.75 s). Exercises the round-4 pair
        # stiction + rolling-stiction passes at the scene level.
        lib = make_lib()
        st = batched_phys([0.55, 0.0, 0.0501])
        sph, coarse, mass, inertia = pack_inputs(lib, 0, [1])
        clut = clutter_bodies([[0.55, 0.0, 0.1301]])
        for _ in range(5):
            st, clut, _ = multi_physics_step(
                P, st, sph, coarse, mass, inertia, clut
            )
        assert abs(float(clut.pos[0, 0, 0]) - 0.55) < 2e-3
        assert 0.115 < float(clut.pos[0, 0, 2]) < 0.155, clut.pos
        assert float(jnp.linalg.norm(clut.linvel[0, 0])) < 5e-3
        assert float(jnp.linalg.norm(clut.angvel[0, 0])) < 0.05
        # and the target under it did not scoot away
        assert abs(float(st.obj.pos[0, 0]) - 0.55) < 5e-3

    def test_pair_friction_stick_and_slide(self):
        # unit pin of the round-4 stiction-exact pair tangential model
        # (was viscous): two single-sphere bodies pressed 1 mm together,
        # relative slide along x.
        from gaddpg_tpu.physics.multi import _pair_forces

        r = 0.02
        pos = jnp.array([[[0.0, 0.0, 0.0], [0.0, 0.0, 2 * r - 0.001]]])
        quat = jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 2, 1))
        coarse = jnp.zeros((1, 2, 1, 4)).at[..., 3].set(r)
        mass = jnp.full((1, 2), 0.2)
        inertia = jnp.full((1, 2, 3), 0.2 * 0.4 * r * r)
        zeros = jnp.zeros((1, 2, 3))

        def ft_at(vx):
            lv = zeros.at[0, 1, 0].set(vx)
            f, _ = _pair_forces(P, pos, quat, lv, zeros, coarse, mass,
                                inertia)
            return float(f[0, 1, 0]), float(f[0, 0, 2])

        # fast slide: kinetic Coulomb, ft == mu * fn exactly
        ft, fn = ft_at(0.5)
        assert abs(-ft - P.friction_mu * (-fn)) < 1e-3 * abs(fn), (ft, fn)
        # slow slide: STICK regime -- the force is the impulse that
        # brakes the contact-point slip within one substep (linear in
        # v, far below the Coulomb cap), not a fixed viscous coefficient
        ft_a, _ = ft_at(0.002)
        ft_b, _ = ft_at(0.01)
        assert abs(ft_b / ft_a - 5.0) < 0.5, (ft_a, ft_b)
        assert abs(ft_b) < 0.5 * P.friction_mu * abs(fn)
        # the stick impulse must account for the rotational response
        # (sphere spins into rolling): weaker than the linear-only
        # m*v/dt estimate
        w_lin = 2.0 / 0.2
        assert abs(ft_b) < 0.9 * 0.01 / (P.dt * w_lin)

    def test_pair_rolling_stiction_torque(self):
        # a pressed, spinning pair receives a braking torque; a
        # separated pair receives none (budget scales with fn)
        from gaddpg_tpu.physics.multi import _pair_forces

        r = 0.02
        quat = jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 2, 1))
        coarse = jnp.zeros((1, 2, 1, 4)).at[..., 3].set(r)
        mass = jnp.full((1, 2), 0.2)
        inertia = jnp.full((1, 2, 3), 0.2 * 0.4 * r * r)
        zeros = jnp.zeros((1, 2, 3))
        av = zeros.at[0, 1, 1].set(2.0)

        pressed = jnp.array([[[0.0, 0.0, 0.0], [0.0, 0.0, 2 * r - 0.001]]])
        f, tau = _pair_forces(P, pressed, quat, zeros, av, coarse, mass,
                              inertia)
        fn = -float(f[0, 0, 2])
        budget = P.friction_mu * fn * P.obj_obj_roll_patch
        # brake torque opposes the spin, bounded by the patch budget
        # plus the tangential pass's own lever contribution
        assert float(tau[0, 1, 1]) < 0.0
        assert -float(tau[0, 1, 1]) < budget + P.friction_mu * fn * 2 * r
        # total angular momentum about the world origin is conserved:
        # sum_i (r_i x F_i + tau_i) == 0 (forces are equal-opposite at
        # the shared contact point; the roll-brake torque pair cancels)
        l_dot = (
            jnp.cross(pressed[0, 0], f[0, 0]) + tau[0, 0]
            + jnp.cross(pressed[0, 1], f[0, 1]) + tau[0, 1]
        )
        np.testing.assert_allclose(np.asarray(l_dot), 0.0, atol=1e-5)

        apart = jnp.array([[[0.0, 0.0, 0.0], [0.0, 0.0, 4 * r]]])
        _, tau0 = _pair_forces(P, apart, quat, zeros, av, coarse, mass,
                               inertia)
        np.testing.assert_allclose(np.asarray(tau0), 0.0, atol=1e-9)

    def test_gripper_clutter_contact_event(self):
        lib = make_lib()
        q = jnp.concatenate([DEFAULT_JOINTS, jnp.array([0.04, 0.04])])
        hand_pos, _ = fk_hand_batched(q[None, :7])
        hp = np.asarray(hand_pos[0])
        st = batched_phys([0.55, 0.3, 0.0501], q=q)
        sph, coarse, mass, inertia = pack_inputs(lib, 0, [1])
        # clutter box centered at the hand -> immediate pad/palm contact
        clut = clutter_bodies([[float(hp[0]), float(hp[1]), float(hp[2])]])
        p0 = np.asarray(clut.pos).copy()
        st, clut, hit = multi_physics_step(
            P, st, sph, coarse, mass, inertia, clut, substeps=20
        )
        assert bool(hit[0])
        assert not bool(st.gripper_contact[0])  # target is far away
        moved = np.linalg.norm(np.asarray(clut.pos) - p0)
        assert moved > 1e-4, moved
