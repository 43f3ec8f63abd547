"""Replay buffer: return backfill, episode map, next-state indexing, npz IO."""

import numpy as np
import jax
import jax.numpy as jnp

from gaddpg_tpu import replay


def make_episode(T=20, n_valid=12, npts=70, reward_last=1.0):
    ep = {
        "point_state": jnp.ones((T, 4, npts)) * jnp.arange(T)[:, None, None],
        "action": jnp.ones((T, 6)) * 0.01,
        "expert_action": jnp.ones((T, 6)) * 0.02,
        "reward": jnp.zeros((T,)).at[n_valid - 1].set(reward_last),
        "terminal": jnp.zeros((T,)).at[n_valid - 1].set(1.0),
        "timestep": jnp.arange(T, dtype=jnp.float32),
        "state_pose": jnp.tile(jnp.eye(4), (T, 1, 1)),
        "goal": jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0.1]), (T, 1)),
        "expert_flags": jnp.ones((T,)),
        "perturb_flags": jnp.zeros((T,)),
        "collide": jnp.zeros((T,)),
        "grasp": jnp.zeros((T,)),
        "target_idx": jnp.zeros((T,)),
    }
    valid = jnp.arange(T) < n_valid
    return ep, valid


class TestAddEpisode:
    def test_return_backfill_gamma(self):
        buf = replay.create_buffer(128, num_points=70)
        ep, valid = make_episode(n_valid=5)
        buf = replay.add_episode(buf, ep, valid, gamma=0.9)
        rets = np.asarray(buf.returns[:5])
        expected = [0.9**4, 0.9**3, 0.9**2, 0.9, 1.0]
        np.testing.assert_allclose(rets, expected, rtol=1e-5)
        assert int(buf.cur_idx) == 5
        assert int(buf.total_env_step) == 5

    def test_episode_map_points_to_end(self):
        buf = replay.create_buffer(128, num_points=70)
        ep, valid = make_episode(n_valid=7)
        buf = replay.add_episode(buf, ep, valid)
        np.testing.assert_array_equal(np.asarray(buf.episode_map[:7]), [6] * 7)
        ep2, valid2 = make_episode(n_valid=4)
        buf = replay.add_episode(buf, ep2, valid2)
        np.testing.assert_array_equal(np.asarray(buf.episode_map[7:11]), [10] * 4)

    def test_invalid_steps_not_written(self):
        buf = replay.create_buffer(128, num_points=70)
        ep, valid = make_episode(n_valid=3)
        buf = replay.add_episode(buf, ep, valid)
        assert int(buf.cur_idx) == 3
        # slot 3 untouched (zeros)
        assert float(jnp.abs(buf.point_state[3]).sum()) == 0.0

    def test_ring_wraparound_restarts_at_zero(self):
        # episodes never straddle the wrap: the third 7-step episode
        # doesn't fit in [14, 16) so it restarts at slot 0
        buf = replay.create_buffer(16, num_points=70)
        for i in range(3):
            ep, valid = make_episode(n_valid=7)
            buf = replay.add_episode(buf, ep, valid)
        assert int(buf.cur_idx) == 7
        assert int(buf.filled) == 14
        # every live slot's episode is contiguous & ascending
        np.testing.assert_array_equal(np.asarray(buf.episode_map[:7]), [6] * 7)
        np.testing.assert_array_equal(np.asarray(buf.episode_map[7:14]), [13] * 7)

    def test_wrap_preserves_next_state_indexing(self):
        # regression: pre-wrap transitions must see idx+1, not the
        # episode end, after the buffer cycles (ADVICE round-1 medium)
        buf = replay.create_buffer(16, num_points=70)
        for i in range(6):
            ep, valid = make_episode(n_valid=7)
            buf = replay.add_episode(buf, ep, valid)
        batch = replay.sample(buf, jax.random.PRNGKey(3), 128, episode_max_len=2)
        idx = np.asarray(batch["batch_idx"])
        em = np.asarray(buf.episode_map)[idx].astype(np.int64)
        nxt = np.minimum(em, idx + 1)
        # successor slot is always within the same episode and ascending
        assert np.all(nxt >= idx)
        assert np.all(em >= idx)
        got = np.asarray(batch["next_point_state"][:, 0, 0])
        want = np.asarray(buf.point_state)[nxt, 0, 0]
        np.testing.assert_allclose(got, want)
        # non-terminal transitions advance exactly one timestep
        term = np.asarray(buf.terminal)[idx] > 0
        cur_t = np.asarray(buf.point_state)[idx, 0, 0]
        np.testing.assert_allclose(got[~term], cur_t[~term] + 1)

    def test_batched_add(self):
        buf = replay.create_buffer(256, num_points=70)
        ep, valid = make_episode(n_valid=6)
        eps = jax.tree_util.tree_map(lambda x: jnp.stack([x, x, x]), ep)
        valids = jnp.stack([valid] * 3)
        buf = replay.add_episodes(buf, eps, valids)
        assert int(buf.cur_idx) == 18


class TestSample:
    def _filled(self, n_eps=12, n_valid=10):
        buf = replay.create_buffer(256, num_points=70)
        for i in range(n_eps):
            ep, valid = make_episode(n_valid=n_valid)
            buf = replay.add_episode(buf, ep, valid)
        return buf

    def test_shapes_and_time(self):
        buf = self._filled()
        batch = replay.sample(buf, jax.random.PRNGKey(0), 32, episode_max_len=10)
        assert batch["point_state"].shape == (32, 4, 70)
        assert batch["next_point_state"].shape == (32, 4, 70)
        # remaining time in [1, n_valid]
        t = np.asarray(batch["time"])
        assert np.all(t >= 1) and np.all(t <= 10)

    def test_next_state_is_successor(self):
        buf = self._filled()
        batch = replay.sample(buf, jax.random.PRNGKey(1), 64, episode_max_len=10)
        idx = np.asarray(batch["batch_idx"])
        em = np.asarray(buf.episode_map)[idx]
        expected_next = np.minimum(em, idx + 1)
        # point_state value encodes the original timestep index
        got = np.asarray(batch["next_point_state"][:, 0, 0])
        want = np.asarray(buf.point_state)[expected_next, 0, 0]
        np.testing.assert_allclose(got, want)

    def test_terminal_next_is_self_or_end(self):
        buf = self._filled()
        batch = replay.sample(buf, jax.random.PRNGKey(2), 64, episode_max_len=10)
        idx = np.asarray(batch["batch_idx"])
        term = np.asarray(buf.terminal)[idx] > 0
        nxt_t = np.asarray(batch["next_point_state"][:, 0, 0])
        cur_t = np.asarray(batch["point_state"][:, 0, 0])
        # terminal steps: next == self (episode_map caps at end)
        np.testing.assert_allclose(nxt_t[term], cur_t[term])


class TestNpzIO:
    def test_roundtrip(self, tmp_path):
        buf = replay.create_buffer(64, num_points=70)
        ep, valid = make_episode(n_valid=9)
        buf = replay.add_episode(buf, ep, valid)
        path = str(tmp_path / "data_test.npz")
        replay.save_npz(buf, path)
        buf2 = replay.load_npz(path, buffer_size=64, num_points=70)
        np.testing.assert_allclose(
            np.asarray(buf.point_state), np.asarray(buf2.point_state)
        )
        np.testing.assert_allclose(np.asarray(buf.returns), np.asarray(buf2.returns))
        assert int(buf2.cur_idx) == int(buf.cur_idx)
