"""Cluttered scenes + CHOMP-style trajectory-optimizer expert.

Covers the reference's multi-object PlanningScene expert workflow
(reference: env/panda_scene.py:881-993, 995-1035): collision-aware
planning, clutter-aware goal selection, clutter occlusion, collision
events.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gaddpg_tpu.envs import EnvParams, PandaGraspEnv
from gaddpg_tpu.envs.assets import box_asset
from gaddpg_tpu.expert import chomp
from gaddpg_tpu.expert.goals import clutter_clear_mask
from gaddpg_tpu.robot.panda import DEFAULT_JOINTS, fk_hand


def goal_at(pos, down=True):
    """Top-down grasp pose at pos."""
    rot = jnp.diag(jnp.array([1.0, -1.0, -1.0])) if down else jnp.eye(3)
    g = jnp.eye(4).at[:3, :3].set(rot).at[:3, 3].set(jnp.asarray(pos))
    return g


class TestPlanner:
    def test_plan_reaches_standoff_free_space(self):
        goal = goal_at([0.5, 0.0, 0.2])
        plan, ok = chomp.plan_to_goal(
            DEFAULT_JOINTS, goal, jnp.zeros((0, 4))
        )
        assert bool(ok)
        # last waypoint's hand pose is at the grasp
        h_end = fk_hand(plan[-1])
        np.testing.assert_allclose(
            np.asarray(h_end[:3, 3]), [0.5, 0.0, 0.2], atol=5e-3
        )
        # smooth: no step larger than 6 cm in cartesian space
        xs = np.stack([np.asarray(fk_hand(plan[t])[:3, 3])
                       for t in range(chomp.PLAN_STEPS)])
        assert np.linalg.norm(np.diff(xs, axis=0), axis=1).max() < 0.06

    def test_plan_avoids_obstacle(self):
        goal = goal_at([0.55, 0.0, 0.15])
        # a fat sphere sitting between the default start and the goal
        obst = jnp.array([[0.42, 0.05, 0.35, 0.06]])
        plan, ok = chomp.plan_to_goal(DEFAULT_JOINTS, goal, obst)
        assert bool(ok)
        res = jax.vmap(
            lambda q: chomp.obstacle_cost(q, obst, margin=0.0, table_z=-1.0)
        )(plan[: chomp.APPROACH_STEPS])
        assert float(jnp.sum(res)) < 1e-6

    def test_plan_action_tracks_waypoints(self):
        goal = goal_at([0.5, 0.1, 0.25])
        plan, ok = chomp.plan_to_goal(DEFAULT_JOINTS, goal, jnp.zeros((0, 4)))
        hand = fk_hand(DEFAULT_JOINTS)
        a = chomp.plan_action(hand, plan, jnp.asarray(0))
        # action moves toward waypoint 1
        tgt = fk_hand(plan[1])
        d_before = float(jnp.linalg.norm(tgt[:3, 3] - hand[:3, 3]))
        moved = hand[:3, 3] + hand[:3, :3] @ a[:3]
        d_after = float(jnp.linalg.norm(tgt[:3, 3] - moved))
        assert d_after < d_before + 1e-6


class TestGoalClearance:
    def test_buried_goal_rejected(self):
        g = goal_at([0.5, 0.0, 0.1])[None]  # (1, 4, 4)
        clear = clutter_clear_mask(g, jnp.zeros((0, 4)))
        assert bool(clear[0])
        blocked = clutter_clear_mask(
            g, jnp.array([[0.5, 0.0, 0.1, 0.05]])
        )
        assert not bool(blocked[0])


class TestClutterEnv:
    def setup_method(self):
        self.env = PandaGraspEnv(
            EnvParams(num_clutter=2, use_planner=True, reset_tries=1),
            box_asset(0.05, 0.05, 0.12),
        )

    def test_reset_contract(self):
        state, obs = jax.jit(self.env.reset)(jax.random.PRNGKey(0))
        assert state.clutter_idx.shape == (2,)
        assert state.clutter_pos.shape == (2, 3)
        assert state.plan.shape == (chomp.PLAN_STEPS, 7)
        assert obs.point_state.shape == (4, 1030)
        # clutter objects rest on the table at distinct spots
        sep = np.linalg.norm(
            np.asarray(state.clutter_pos[0, :2]) -
            np.asarray(state.clutter_pos[1, :2])
        )
        assert sep > 0.05

    def test_clutter_points_labeled_in_obs(self):
        """Visible clutter surface enters the point state with
        OBSTACLE_LABEL in channel 3 (round-3 collision-aware obs;
        extension past the reference's target-only cloud, reference:
        env/panda_scene.py:1178-1206); the validity count still only
        counts target points."""
        from gaddpg_tpu.render.pointcloud import OBSTACLE_LABEL

        state, obs = jax.jit(self.env.reset)(jax.random.PRNGKey(7))
        flags = None
        for i in range(4):  # a few steps accumulate both classes
            state, obs, _, _, info = jax.jit(self.env.step)(
                state, jnp.zeros(6), jax.random.PRNGKey(100 + i))
            flags = np.asarray(obs.point_state[3])
            if (flags == OBSTACLE_LABEL).any():
                break
        assert set(np.unique(flags)) <= {0.0, 1.0, OBSTACLE_LABEL}
        assert (flags == OBSTACLE_LABEL).any(), "no obstacle points seen"
        assert int(info["point_num"]) > 0  # target count, not total

    def test_clutter_collision_event(self):
        state, _ = jax.jit(self.env.reset)(jax.random.PRNGKey(1))
        hand = self.env._hand(state)
        # teleport a clutter object into the palm -> collision
        state2 = state.replace(
            clutter_pos=state.clutter_pos.at[0].set(
                hand[:3, 3] + hand[:3, :3] @ jnp.array([0.0, 0.0, 0.03])
            )
        )
        assert bool(self.env._clutter_collision(state2, hand))
        assert not bool(self.env._clutter_collision(state, hand))

    def test_clutter_is_dynamic(self):
        # clutter bodies are simulated (physics/multi.py), not props:
        # a raised one falls back to the table, a settled one stays put
        state, _ = jax.jit(self.env.reset)(jax.random.PRNGKey(4))
        lifted = state.replace(
            clutter_pos=state.clutter_pos.at[0, 2].add(0.10)
        )
        stepped = self.env._physics(lifted)  # 150 ms of simulation
        drop = float(lifted.clutter_pos[0, 2] - stepped.clutter_pos[0, 2])
        assert drop > 0.05, drop
        hold = np.linalg.norm(
            np.asarray(stepped.clutter_pos[1] - state.clutter_pos[1])
        )
        assert hold < 0.01, hold
        # falling obstacle never triggers the robot-collision event
        assert not bool(stepped.collided)

    def test_online_training_smoke_in_dynamic_clutter(self):
        # the full collect->update loop through the multi-body physics
        # path (td3_clutter.yaml workflow at toy scale): rollouts in
        # 2-obstacle scenes with DYNAMIC clutter must fill the buffer
        # and the DDPG update must produce finite losses
        from gaddpg_tpu import replay
        from gaddpg_tpu.train.config import load_config
        from gaddpg_tpu.train.loop import Trainer

        cfg = load_config(
            "experiments/cfgs/td3_clutter.yaml",
            overrides={
                "num_remotes": 4, "batch_size": 8, "updates_per_step": 1,
                "RL_MEMORY_SIZE": 2000, "ONPOLICY_MEMORY_SIZE": 1000,
            },
            policy="DDPG",
        )
        assert cfg.env.num_clutter == 2
        tr = Trainer(cfg)
        tr.collect()
        n = int(replay.upper_idx(tr.buffer)) + (
            int(replay.upper_idx(tr.online_buffer))
            if tr.online_buffer is not None else 0
        )
        assert n > 0
        metrics = tr.train_iter()
        if metrics:
            for v in metrics.values():
                assert np.isfinite(v), metrics

    def test_clutter_occludes_target(self):
        state, obs = jax.jit(self.env.reset)(jax.random.PRNGKey(2))
        hand = self.env._hand(state)
        cam = hand @ jnp.eye(4)
        # clutter object placed right in front of the camera kills most
        # target points
        k = jax.random.PRNGKey(3)
        _, obs_clear = self.env._observe(state, k)
        blocked = state.replace(
            clutter_pos=state.clutter_pos.at[:].set(
                hand[:3, 3] + hand[:3, :3] @ jnp.array([0.0, 0.0, 0.1])
            ),
            pc=type(state.pc)(
                points=jnp.zeros_like(state.pc.points),
                count=jnp.asarray(0, jnp.int32),
                cursor=jnp.asarray(0, jnp.int32),
            ),
        )
        state_b, obs_blocked = self.env._observe(blocked, k)
        assert int(obs_blocked.num_points) < max(int(obs_clear.num_points), 1)
