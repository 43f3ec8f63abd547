"""FK/IK: structural invariants, independent-chain cross-check, roundtrips."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from gaddpg_tpu import robot as rb


def fk_numpy_reference(q):
    """Independent numpy FK built straight from URDF numbers.

    Written separately from the jnp implementation (scipy rotations,
    different composition order bookkeeping) to act as an oracle.
    """
    def T(rpy, xyz):
        out = np.eye(4)
        out[:3, :3] = R.from_euler("xyz", rpy).as_matrix()
        out[:3, 3] = xyz
        return out

    def Rz(a):
        out = np.eye(4)
        out[:3, :3] = R.from_euler("z", a).as_matrix()
        return out

    hpi = np.pi / 2
    chain = [
        T([0, 0, 0], [0, 0, 0.333]),
        T([-hpi, 0, 0], [0, 0, 0]),
        T([hpi, 0, 0], [0, -0.316, 0]),
        T([hpi, 0, 0], [0.0825, 0, 0]),
        T([-hpi, 0, 0], [-0.0825, 0.384, 0]),
        T([hpi, 0, 0], [0, 0, 0]),
        T([hpi, 0, 0], [0.088, 0, 0]),
    ]
    out = np.eye(4)
    for i in range(7):
        out = out @ chain[i] @ Rz(q[i])
    return out @ T([0, 0, -np.pi / 4], [0, 0, 0.107])


class TestFK:
    def test_matches_numpy_oracle(self):
        rng = np.random.RandomState(0)
        for _ in range(20):
            q = rng.uniform(np.asarray(rb.JOINT_LOWER), np.asarray(rb.JOINT_UPPER))
            ours = np.asarray(rb.fk_hand(jnp.array(q)))
            ref = fk_numpy_reference(q)
            np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_home_pose_reachable_workspace(self):
        # home config puts hand in front of base, above the table plane
        T = np.asarray(rb.fk_hand(rb.DEFAULT_JOINTS))
        assert 0.05 < T[0, 3] < 0.65
        assert abs(T[1, 3]) < 0.1
        assert 0.2 < T[2, 3] < 0.9

    def test_camera_offset(self):
        q = rb.DEFAULT_JOINTS
        hand = np.asarray(rb.fk_hand(q))
        cam = np.asarray(rb.fk_camera(q))
        rel = np.linalg.inv(hand) @ cam
        np.testing.assert_allclose(rel[:3, 3], [0.036, 0, 0.036], atol=1e-6)
        # camera z-axis (optical) == hand x axis under rpy(-pi/2,0,-pi/2)
        ref_rot = R.from_euler("xyz", [-np.pi / 2, 0, -np.pi / 2]).as_matrix()
        np.testing.assert_allclose(rel[:3, :3], ref_rot, atol=1e-6)

    def test_fingers_symmetric(self):
        f = np.asarray(rb.fk_fingers(rb.DEFAULT_JOINTS, jnp.array([0.04, 0.04])))
        hand = np.asarray(rb.fk_hand(rb.DEFAULT_JOINTS))
        lp = np.linalg.inv(hand) @ f[0]
        rp = np.linalg.inv(hand) @ f[1]
        np.testing.assert_allclose(lp[:3, 3], [0, 0.04, 0.0584], atol=1e-6)
        np.testing.assert_allclose(rp[:3, 3], [0, -0.04, 0.0584], atol=1e-6)

    def test_vmap(self):
        qs = jnp.tile(rb.DEFAULT_JOINTS, (16, 1))
        out = jax.vmap(rb.fk_hand)(qs)
        assert out.shape == (16, 4, 4)


class TestIK:
    def test_fk_ik_roundtrip(self):
        rng = np.random.RandomState(1)
        successes = 0
        for i in range(10):
            q = rng.uniform(
                np.asarray(rb.JOINT_LOWER) * 0.6, np.asarray(rb.JOINT_UPPER) * 0.6
            )
            T = np.asarray(rb.fk_hand(jnp.array(q)))
            q_sol, ok = rb.ik_from_seeds(jnp.array(T[:3, 3]), jnp.array(T[:3, :3]))
            if bool(ok):
                T2 = np.asarray(rb.fk_hand(q_sol))
                np.testing.assert_allclose(T2[:3, 3], T[:3, 3], atol=1e-2)
                successes += 1
        assert successes >= 8, f"IK solved only {successes}/10 reachable poses"

    def test_single_seed_converges_near(self):
        q = np.asarray(rb.DEFAULT_JOINTS) + 0.1
        T = np.asarray(rb.fk_hand(jnp.array(q)))
        q_sol, perr, rerr = rb.dls_ik(
            rb.DEFAULT_JOINTS, jnp.array(T[:3, 3]), jnp.array(T[:3, :3])
        )
        assert float(perr) < 1e-3
        assert float(rerr) < 1e-2

    def test_pos_only_mode(self):
        target = jnp.array([0.4, 0.1, 0.3])
        q_sol, ok = rb.ik_from_seeds(target, jnp.eye(3), pos_only=True)
        T = np.asarray(rb.fk_hand(q_sol))
        np.testing.assert_allclose(T[:3, 3], np.asarray(target), atol=1e-2)
