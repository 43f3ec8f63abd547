"""Expert components: grasp DBs, nearest-goal query, servo convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from gaddpg_tpu.envs.assets import (
    box_asset, cylinder_asset, library_from_index, ycb_proxy_specs,
)
from gaddpg_tpu.expert.goals import nearest_grasp_goal, reachable_grasp_mask
from gaddpg_tpu.expert.servo import expert_action
from gaddpg_tpu.geometry.se3 import se3_from_quat_pos, unpack_action


class TestGraspDB:
    def test_every_graspable_object_has_grasps(self):
        lib = library_from_index("ycb", "train")
        counts = np.asarray(lib.grasp_valid.sum(axis=1))
        for name, c in zip(lib.names, counts):
            if name == "019_pitcher_base":  # too wide for the gripper
                continue
            assert c > 0, f"{name} has no valid grasps"

    def test_grasp_width_fits_gripper(self):
        # closing axis extent of the object at the grasp must fit 8 cm
        lib = box_asset(0.05, 0.05, 0.14)
        g = np.asarray(lib.grasps[0])
        valid = np.asarray(lib.grasp_valid[0])
        assert valid.sum() > 0

    def test_reachable_mask_rejects_from_below(self):
        up_grasp = jnp.eye(4)[None]  # +z approach pointing world up
        mask = reachable_grasp_mask(up_grasp, jnp.array([True]))
        assert not bool(mask[0])

    def test_nearest_picks_closest(self):
        lib = box_asset(0.05, 0.05, 0.14)
        obj_pose = se3_from_quat_pos(jnp.array([1.0, 0, 0, 0]),
                                     jnp.array([0.5, 0.0, 0.07]))
        hand = jnp.eye(4).at[:3, 3].set(jnp.array([0.5, 0.0, 0.4]))
        # hand z must face the scene for sensible PM distances
        goal_w, rel, found = nearest_grasp_goal(
            hand, obj_pose, lib.grasps[0], lib.grasp_valid[0]
        )
        assert bool(found)
        # goal hand position should be near the object
        assert float(jnp.linalg.norm(goal_w[:3, 3] - obj_pose[:3, 3])) < 0.25


class TestServo:
    def test_converges_in_free_space(self):
        goal = se3_from_quat_pos(jnp.array([1.0, 0, 0, 0]), jnp.array([0.2, 0.1, 0.3]))
        hand = se3_from_quat_pos(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.0, 0.6]))
        for _ in range(30):
            a = expert_action(hand, goal)
            hand = hand @ unpack_action(a)
        err = float(jnp.linalg.norm(hand[:3, 3] - goal[:3, 3]))
        assert err < 0.01, f"servo did not converge: {err}"

    def test_actions_within_bounds(self):
        goal = se3_from_quat_pos(jnp.array([1.0, 0, 0, 0]), jnp.array([0.5, 0.5, 0.0]))
        hand = jnp.eye(4)
        a = np.asarray(expert_action(hand, goal))
        high = np.array([0.06, 0.06, 0.06, np.pi / 6, np.pi / 6, np.pi / 6])
        assert np.all(np.abs(a) <= high + 1e-6)

    def test_goes_through_standoff(self):
        # from far away, the first target is the standoff, not the grasp
        goal = se3_from_quat_pos(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.0, 0.0]))
        hand = se3_from_quat_pos(jnp.array([1.0, 0, 0, 0]), jnp.array([0.3, 0.0, 0.0]))
        # move until nearly converged; trajectory must pass near the
        # standoff point (0, 0, -0.08 in goal frame = 8cm behind along +z)
        passed_standoff = False
        for _ in range(30):
            a = expert_action(hand, goal)
            hand = hand @ unpack_action(a)
            d_standoff = float(jnp.linalg.norm(
                hand[:3, 3] - jnp.array([0.0, 0.0, -0.08])
            ))
            if d_standoff < 0.02:
                passed_standoff = True
        assert passed_standoff
