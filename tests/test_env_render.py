"""Camera render geometry, point accumulation, env reset/step contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from gaddpg_tpu.envs import EnvParams, PandaGraspEnv, box_asset
from gaddpg_tpu.render.camera import (
    CameraParams,
    box_zdepth,
    plane_zdepth,
    render_depth_points,
    render_rgbdm,
    visible_points,
)
from gaddpg_tpu.render.pointcloud import (
    accumulate_points,
    build_point_state,
    create_pc_state,
)


class TestCamera:
    def test_depth_of_frontal_plane(self):
        cam = CameraParams()
        # plane of points 0.5 m in front of a camera at origin (+z fwd)
        g = jnp.linspace(-0.2, 0.2, 30)
        pts = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
        pts = jnp.concatenate([pts, jnp.full((pts.shape[0], 1), 0.5)], -1)
        depth = render_depth_points(cam, jnp.eye(4), pts)
        hit = np.asarray(depth[depth > 0])
        assert len(hit) > 100
        np.testing.assert_allclose(hit, 0.5, atol=1e-3)

    def test_zbuffer_keeps_nearest(self):
        cam = CameraParams()
        near_pt = jnp.array([[0.0, 0.0, 0.3]])
        far_pt = jnp.array([[0.0, 0.0, 1.0]])
        both = jnp.concatenate([far_pt, near_pt])
        depth = render_depth_points(cam, jnp.eye(4), both)
        center = float(depth[cam.height // 2, cam.width // 2])
        assert abs(center - 0.3) < 1e-3

    def test_visible_points_roundtrip(self):
        cam = CameraParams()
        g = jnp.linspace(-0.1, 0.1, 20)
        pts = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
        pts = jnp.concatenate([pts, jnp.full((pts.shape[0], 1), 0.4)], -1)
        out, valid = visible_points(cam, jnp.eye(4), pts, max_points=256)
        sel = np.asarray(out)[np.asarray(valid)]
        assert len(sel) > 50
        np.testing.assert_allclose(sel[:, 2], 0.4, atol=1e-3)
        # backprojected x/y inside the original extent (pixel quantized)
        assert np.all(np.abs(sel[:, :2]) < 0.11)

    def test_behind_camera_invisible(self):
        cam = CameraParams()
        pts = jnp.array([[0.0, 0.0, -0.5], [0.1, 0.0, -1.0]])
        depth = render_depth_points(cam, jnp.eye(4), pts)
        assert float(depth.sum()) == 0.0


class TestOcclusion:
    """Occlusion-correct observations: a gripper box between camera and
    target removes the hidden points (reference renders the full scene
    and segments the target, reference: env/panda_scene.py:414-453)."""

    def _target_plane(self, z=0.5, half=0.15, n=30):
        g = jnp.linspace(-half, half, n)
        pts = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
        return jnp.concatenate([pts, jnp.full((pts.shape[0], 1), z)], -1)

    def test_box_zdepth_hits_frontal_box(self):
        cam = CameraParams()
        box = jnp.eye(4).at[2, 3].set(0.3)  # box center 0.3 m ahead
        occ = box_zdepth(cam, jnp.eye(4), box, (0.05, 0.05, 0.02))
        center = float(occ[cam.height // 2, cam.width // 2])
        assert abs(center - 0.28) < 1e-3  # front face at 0.3 - 0.02
        assert not np.isfinite(float(occ[0, 0]))  # corners miss

    def test_box_occludes_target_points(self):
        cam = CameraParams()
        pts = self._target_plane(z=0.5)
        full, v_full = visible_points(cam, jnp.eye(4), pts, max_points=1024)
        box = jnp.eye(4).at[2, 3].set(0.3)
        occ = box_zdepth(cam, jnp.eye(4), box, (0.05, 0.05, 0.02))
        part, v_part = visible_points(
            cam, jnp.eye(4), pts, max_points=1024, occ_depth=occ
        )
        n_full = int(v_full.sum())
        n_part = int(v_part.sum())
        assert n_part < n_full  # box hides the center of the plane
        # every surviving point is outside the box's angular footprint
        sel = np.asarray(part)[np.asarray(v_part)]
        assert np.all(np.maximum(np.abs(sel[:, 0]), np.abs(sel[:, 1])) > 0.045)

    def test_plane_zdepth_culls_through_table_view(self):
        cam = CameraParams()
        # camera below the table looking up (+z world) at a target above:
        # the table plane z=0.4 (camera frame) must hide everything
        pts = self._target_plane(z=0.5)
        occ = plane_zdepth(cam, jnp.eye(4), 0.4)
        _, v = visible_points(cam, jnp.eye(4), pts, max_points=512, occ_depth=occ)
        assert int(v.sum()) == 0

    def test_rgbdm_mask_respects_occlusion(self):
        cam = CameraParams()
        pts = self._target_plane(z=0.5)
        box = jnp.eye(4).at[2, 3].set(0.3)
        occ = box_zdepth(cam, jnp.eye(4), box, (0.05, 0.05, 0.02))
        img = render_rgbdm(cam, jnp.eye(4), pts, jnp.ones(3), occ_depth=occ)
        c = cam.height // 2
        # center pixel: occluder -> background mask, occluder depth
        assert float(img[4, c, c]) == 1.0
        assert abs(float(img[3, c, c]) - 0.28) < 1e-3

    def test_env_step_with_occlusion_smoke(self):
        env = PandaGraspEnv(EnvParams(), box_asset(0.05, 0.05, 0.12))
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        assert bool(state.valid_scene) in (True, False)
        state2, obs2, _, _, info = jax.jit(env.step)(
            state, jnp.zeros(6), jax.random.PRNGKey(1)
        )
        assert int(info["point_num"]) > 0


class TestAccumulation:
    def test_accumulate_and_sample(self):
        pc = create_pc_state(256)
        key = jax.random.PRNGKey(0)
        pts = jnp.tile(jnp.array([[1.0, 2.0, 3.0]]), (64, 1))
        pc = accumulate_points(pc, key, pts, jnp.ones(64, bool), jnp.asarray(0))
        assert int(pc.count) == 64
        state, n = build_point_state(pc, key, jnp.eye(4), num_pts=128)
        assert state.shape == (4, 134)
        assert int(n) == 64
        # hand anchor flags
        np.testing.assert_allclose(np.asarray(state[3, :6]), 1.0)
        np.testing.assert_allclose(np.asarray(state[3, 6:]), 0.0)
        np.testing.assert_allclose(np.asarray(state[:3, 6:]).T,
                                   np.tile([1.0, 2.0, 3.0], (128, 1)))

    def test_only_valid_slots_sampled(self):
        pc = create_pc_state(256)
        key = jax.random.PRNGKey(5)
        pts = jnp.tile(jnp.array([[9.0, 9.0, 9.0]]), (16, 1))
        pc = accumulate_points(pc, key, pts, jnp.ones(16, bool), jnp.asarray(0))
        state, _ = build_point_state(pc, key, jnp.eye(4), num_pts=64)
        # every sampled point must be a written one, never a zero pad slot
        np.testing.assert_allclose(np.asarray(state[:3, 6:]), 9.0)

    def test_obstacle_labels_round_trip(self):
        """Obstacle inserts surface in channel 3 as OBSTACLE_LABEL and
        never count toward the target-point validity total."""
        from gaddpg_tpu.render.pointcloud import OBSTACLE_LABEL

        pc = create_pc_state(256)
        key = jax.random.PRNGKey(2)
        tgt = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (32, 1))
        obs = jnp.tile(jnp.array([[0.0, 5.0, 0.0]]), (16, 1))
        pc = accumulate_points(pc, key, tgt, jnp.ones(32, bool), jnp.asarray(0))
        pc = accumulate_points(pc, key, obs, jnp.ones(16, bool), jnp.asarray(0),
                               label=OBSTACLE_LABEL)
        state, n_target = build_point_state(pc, key, jnp.eye(4), num_pts=256)
        assert int(n_target) == 32  # obstacle points excluded
        flags = np.asarray(state[3])
        np.testing.assert_allclose(flags[:6], 1.0)
        assert set(np.unique(flags[6:])) <= {0.0, OBSTACLE_LABEL}
        assert (flags[6:] == OBSTACLE_LABEL).any()
        # label agrees with geometry: obstacle-labeled samples sit at y=5
        pts = np.asarray(state[:3, 6:]).T
        ob = flags[6:] == OBSTACLE_LABEL
        np.testing.assert_allclose(pts[ob, 1], 5.0)
        np.testing.assert_allclose(pts[~ob, 1], 0.0)

    def test_decay_reduces_kept_points(self):
        pc0 = create_pc_state(4096)
        key = jax.random.PRNGKey(1)
        pts = jnp.zeros((512, 3))
        v = jnp.ones(512, bool)
        pc_early = accumulate_points(pc0, key, pts, v, jnp.asarray(0), 0.95)
        pc_late = accumulate_points(pc0, key, pts, v, jnp.asarray(19), 0.95)
        # 0.95^19 ~ 0.38 of the points kept late vs ~all early
        assert int(pc_late.count) < int(pc_early.count) * 0.6


class TestEnv:
    def setup_method(self):
        self.env = PandaGraspEnv(EnvParams(), box_asset(0.05, 0.05, 0.12))

    def test_reset_contract(self):
        state, obs = jax.jit(self.env.reset)(jax.random.PRNGKey(0))
        assert obs.point_state.shape == (4, 1030)
        assert obs.goal_pose.shape == (7,)
        assert obs.joint_pos.shape == (9,)
        # object upright on the table
        assert abs(float(state.phys.obj.pos[2]) - 0.06) < 0.01

    def test_step_moves_hand(self):
        state, obs = jax.jit(self.env.reset)(jax.random.PRNGKey(1))
        action = jnp.array([0.0, 0.0, 0.05, 0.0, 0.0, 0.0])
        state2, obs2, r, d, info = jax.jit(self.env.step)(
            state, action, jax.random.PRNGKey(2)
        )
        moved = np.linalg.norm(
            np.asarray(obs2.ef_pose[:3, 3]) - np.asarray(obs.ef_pose[:3, 3])
        )
        assert 0.02 < moved < 0.08  # ~5 cm requested
        assert int(state2.env_step) == 1

    def test_fall_terminates(self):
        state, obs = jax.jit(self.env.reset)(jax.random.PRNGKey(3))
        # pretend the object started 5 cm higher: the fall check
        # (pos_z - init_z < -0.03) must fire
        state = state.replace(init_obj_z=state.init_obj_z + 0.05)
        state2, _, _, done, _ = jax.jit(self.env.step)(
            state, jnp.zeros(6), jax.random.PRNGKey(4)
        )
        assert bool(done)
