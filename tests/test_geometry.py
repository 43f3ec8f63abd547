"""Geometry vs scipy.spatial.transform oracle + algebraic identities."""

import numpy as np
import jax.numpy as jnp
import jax
import pytest
from scipy.spatial.transform import Rotation as R

from gaddpg_tpu import geometry as geo


def random_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q_wxyz):
    return np.roll(q_wxyz, -1, axis=-1)  # scipy uses xyzw


class TestRotations:
    def test_quat_to_mat_matches_scipy(self):
        q = random_quats(64)
        ours = np.asarray(geo.quat_to_mat(jnp.array(q)))
        ref = R.from_quat(to_scipy(q)).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_mat_to_quat_roundtrip(self):
        q = random_quats(128, seed=1)
        # canonicalize sign w>=0 like ours
        q = q * np.where(q[:, :1] < 0, -1.0, 1.0)
        m = R.from_quat(to_scipy(q)).as_matrix()
        ours = np.asarray(geo.mat_to_quat(jnp.array(m)))
        np.testing.assert_allclose(ours, q, atol=1e-5)

    def test_mat_to_quat_near_identity_and_pi(self):
        # degenerate cases: identity, 180-degree rotations about each axis
        mats = [np.eye(3)]
        for axis in np.eye(3):
            mats.append(R.from_rotvec(np.pi * axis).as_matrix())
        for m in mats:
            q = np.asarray(geo.mat_to_quat(jnp.array(m)))
            m2 = np.asarray(geo.quat_to_mat(jnp.array(q)))
            np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_quat_mul_matches_scipy(self):
        q1, q2 = random_quats(32, 2), random_quats(32, 3)
        ours = np.asarray(geo.quat_mul(jnp.array(q1), jnp.array(q2)))
        ref = (R.from_quat(to_scipy(q1)) * R.from_quat(to_scipy(q2))).as_quat()
        ref = np.roll(ref, 1, axis=-1)
        sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours, ref * sign, atol=1e-5)

    def test_quat_rotate_matches_matrix(self):
        q = random_quats(32, 4)
        v = np.random.RandomState(5).randn(32, 3)
        ours = np.asarray(geo.quat_rotate(jnp.array(q), jnp.array(v)))
        ref = np.einsum("nij,nj->ni", R.from_quat(to_scipy(q)).as_matrix(), v)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_euler_sxyz_matches_scipy(self):
        e = np.random.RandomState(6).uniform(-np.pi, np.pi, (64, 3))
        ours = np.asarray(geo.euler_to_mat(jnp.array(e)))
        ref = R.from_euler("xyz", e).as_matrix()  # lowercase = extrinsic = sxyz
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_mat_to_euler_roundtrip(self):
        e = np.random.RandomState(7).uniform(-1.4, 1.4, (64, 3))
        m = np.asarray(geo.euler_to_mat(jnp.array(e)))
        e2 = np.asarray(geo.mat_to_euler(jnp.array(m)))
        m2 = np.asarray(geo.euler_to_mat(jnp.array(e2)))
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_quat_integrate_small_step(self):
        q = jnp.array([1.0, 0, 0, 0])
        omega = jnp.array([0.0, 0.0, 1.0])  # 1 rad/s about z
        dt = 1e-3
        for _ in range(1000):
            q = geo.quat_integrate(q, omega, dt)
        ref = R.from_rotvec([0, 0, 1.0]).as_quat()
        ref = np.roll(ref, 1)
        np.testing.assert_allclose(np.asarray(q), ref, atol=1e-3)


class TestSE3:
    def test_inverse(self):
        q = random_quats(16, 8)
        t = np.random.RandomState(9).randn(16, 3)
        T = geo.se3_from_quat_pos(jnp.array(q), jnp.array(t))
        eye = np.asarray(T @ geo.se3_inverse(T))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_pack_unpack_roundtrip(self):
        q = random_quats(16, 10)
        q = q * np.where(q[:, :1] < 0, -1, 1)
        t = np.random.RandomState(11).randn(16, 3)
        T = geo.se3_from_quat_pos(jnp.array(q), jnp.array(t))
        p = geo.pack_pose(T)
        np.testing.assert_allclose(np.asarray(geo.unpack_pose(p)), np.asarray(T), atol=1e-5)
        pr = geo.pack_pose_rot_first(T)
        np.testing.assert_allclose(
            np.asarray(geo.unpack_pose_rot_first(pr)), np.asarray(T), atol=1e-5
        )

    def test_inv_relative_pose(self):
        # T_{b->c} composed with c->a should recover b->a
        qb, qc = random_quats(8, 12), random_quats(8, 13)
        tb = np.random.RandomState(14).randn(8, 3)
        tc = np.random.RandomState(15).randn(8, 3)
        pose_b = jnp.concatenate([jnp.array(tb), jnp.array(qb)], axis=-1)
        pose_c = jnp.concatenate([jnp.array(tc), jnp.array(qc)], axis=-1)
        T_bc = geo.inv_relative_pose(pose_b, pose_c)
        T_ca = geo.unpack_pose(pose_c)
        T_ba = geo.unpack_pose(pose_b)
        np.testing.assert_allclose(np.asarray(T_ca @ T_bc), np.asarray(T_ba), atol=1e-5)

    def test_unpack_action_log_roundtrip(self):
        a = np.random.RandomState(16).uniform(-0.5, 0.5, (32, 6))
        T = geo.unpack_action(jnp.array(a))
        a2 = np.asarray(geo.se3_log_pose_delta(T))
        np.testing.assert_allclose(a2, a, atol=1e-5)


class TestGripperPoints:
    def test_rotz_control_points_match_hand_finger_points(self):
        # control_points(rotz=True) equals the env's anchor layout as a SET
        # (the +-y symmetric finger pairs come out permuted, exactly as in
        # the reference where p @ Rz(pi/2) maps (x,y,z)->(y,-x,z)).
        pts = np.asarray(geo.control_points(rotz=True))
        ref = np.asarray(geo.HAND_FINGER_POINTS).T
        pts_sorted = pts[np.lexsort(pts.T)]
        ref_sorted = ref[np.lexsort(ref.T)]
        np.testing.assert_allclose(pts_sorted, ref_sorted, atol=1e-7)

    def test_transform_control_points_identity(self):
        qt = jnp.array([[1.0, 0, 0, 0, 0.1, 0.2, 0.3]])
        out = np.asarray(geo.transform_control_points_qt(qt))
        ref = np.asarray(geo.GRIPPER_CONTROL_POINTS) + np.array([0.1, 0.2, 0.3])
        np.testing.assert_allclose(out[0], ref, atol=1e-6)

    def test_euler_trans_equals_qt_path(self):
        rng = np.random.RandomState(17)
        e = rng.uniform(-1, 1, (16, 3))
        t = rng.randn(16, 3)
        m = R.from_euler("xyz", e)
        q = np.roll(m.as_quat(), 1, axis=-1)
        qt = jnp.concatenate([jnp.array(q), jnp.array(t)], axis=-1)
        a = np.asarray(geo.transform_control_points_qt(qt))
        b = np.asarray(geo.control_points_from_euler_trans(jnp.array(e), jnp.array(t)))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_vmap_jit(self):
        f = jax.jit(jax.vmap(geo.transform_control_points_qt))
        qt = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (4, 8, 1))
        out = f(qt)
        assert out.shape == (4, 8, 6, 3)
