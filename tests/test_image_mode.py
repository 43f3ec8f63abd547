"""Image-observation (RGBDM -> ResNet-18) training path.

Covers use_image end to end (reference: experiments/config.py:105,
core/networks.py:106-147): agent construction, BC + DDPG updates on
image batches, replay image storage.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gaddpg_tpu import replay
from gaddpg_tpu.agents.bc import make_bc_update
from gaddpg_tpu.agents.config import AgentConfig
from gaddpg_tpu.agents.ddpg import make_ddpg_update, make_select_action
from gaddpg_tpu.agents.state import create_agent_state

S = 32  # tiny images keep the CPU test fast


def image_batch(batch, key):
    ks = jax.random.split(key, 3)
    img = jax.random.uniform(ks[0], (batch, 5, S, S))
    goal = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0.1]), (batch, 1))
    return {
        "image_state": img,
        "next_image_state": img,
        "point_state": jnp.zeros((batch, 4, 70)),
        "next_point_state": jnp.zeros((batch, 4, 70)),
        "action": jax.random.uniform(ks[1], (batch, 6), minval=-0.05, maxval=0.05),
        "expert_action": jax.random.uniform(ks[2], (batch, 6), minval=-0.05,
                                            maxval=0.05),
        "reward": jnp.zeros((batch,)),
        "return": jnp.ones((batch,)),
        "terminal": jnp.zeros((batch,)),
        "time": jnp.full((batch,), 10.0),
        "goal": goal,
        "next_goal": goal,
        "expert_flags": jnp.ones((batch,)),
        "perturb_flags": jnp.zeros((batch,)),
    }


class TestImageAgent:
    def test_bc_update_decreases_loss(self):
        cfg = AgentConfig(use_image=True, image_size=S, batch_size=8)
        state = create_agent_state(jax.random.PRNGKey(0), cfg)
        update = jax.jit(make_bc_update(cfg), donate_argnums=(0,))
        batch = image_batch(8, jax.random.PRNGKey(1))
        losses = []
        for i in range(6):
            state, m = update(state, batch, jax.random.PRNGKey(2 + i))
            losses.append(float(m["bc_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_ddpg_update_runs(self):
        cfg = AgentConfig(use_image=True, image_size=S, batch_size=4)
        state = create_agent_state(jax.random.PRNGKey(0), cfg)
        update = jax.jit(make_ddpg_update(cfg), donate_argnums=(0,))
        state, m = update(state, image_batch(4, jax.random.PRNGKey(1)),
                          jax.random.PRNGKey(2))
        assert np.isfinite(float(m["critic_loss"]))
        assert int(state.update_step) == 1

    def test_select_action_from_image(self):
        cfg = AgentConfig(use_image=True, image_size=S)
        state = create_agent_state(jax.random.PRNGKey(0), cfg)
        select = make_select_action(cfg)
        img = jnp.zeros((3, 5, S, S))
        a, aux = jax.jit(lambda st, im: select(st, im, jnp.full((3,), 5.0),
                                               jax.random.PRNGKey(1), 0.0, False))(
            state, img
        )
        assert a.shape == (3, 6)
        assert np.isfinite(np.asarray(a)).all()


class TestImageReplay:
    def test_image_storage_roundtrip(self):
        buf = replay.create_buffer(64, num_points=70, image_shape=(5, S, S))
        T = 10
        ep = {
            "point_state": jnp.zeros((T, 4, 70)),
            "image_state": jnp.ones((T, 5, S, S)) * jnp.arange(T)[:, None, None, None],
            "action": jnp.zeros((T, 6)),
            "expert_action": jnp.zeros((T, 6)),
            "reward": jnp.zeros((T,)).at[T - 1].set(1.0),
            "terminal": jnp.zeros((T,)).at[T - 1].set(1.0),
            "timestep": jnp.arange(T, dtype=jnp.float32),
            "state_pose": jnp.tile(jnp.eye(4), (T, 1, 1)),
            "goal": jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0.1]), (T, 1)),
            "expert_flags": jnp.ones((T,)),
            "perturb_flags": jnp.zeros((T,)),
            "collide": jnp.zeros((T,)),
            "grasp": jnp.zeros((T,)),
            "target_idx": jnp.zeros((T,)),
        }
        valid = jnp.ones((T,), bool)
        buf = replay.add_episode(buf, ep, valid)
        batch = replay.sample(buf, jax.random.PRNGKey(0), 16, episode_max_len=4)
        assert batch["image_state"].shape == (16, 5, S, S)
        # next image belongs to the successor transition
        idx = np.asarray(batch["batch_idx"])
        nxt = np.minimum(np.asarray(buf.episode_map)[idx], idx + 1)
        np.testing.assert_allclose(
            np.asarray(batch["next_image_state"][:, 0, 0, 0]), nxt.astype(np.float32)
        )

    def test_npz_roundtrip_preserves_images(self, tmp_path):
        # round-4 image-pipeline bug: save_npz dropped image_state, so
        # a reloaded image buffer raised KeyError in the BC update
        from gaddpg_tpu.replay.npz_io import load_npz, save_npz

        buf = replay.create_buffer(64, num_points=70, image_shape=(5, S, S))
        T = 6
        ep = {
            "point_state": jnp.zeros((T, 4, 70)),
            "image_state": jnp.ones((T, 5, S, S))
            * jnp.arange(T)[:, None, None, None] / 8.0,
            "action": jnp.zeros((T, 6)),
            "expert_action": jnp.zeros((T, 6)),
            "reward": jnp.zeros((T,)).at[T - 1].set(1.0),
            "terminal": jnp.zeros((T,)).at[T - 1].set(1.0),
            "timestep": jnp.arange(T, dtype=jnp.float32),
            "state_pose": jnp.tile(jnp.eye(4), (T, 1, 1)),
            "goal": jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0.1]), (T, 1)),
            "expert_flags": jnp.ones((T,)),
            "perturb_flags": jnp.zeros((T,)),
            "collide": jnp.zeros((T,)),
            "grasp": jnp.zeros((T,)),
            "target_idx": jnp.zeros((T,)),
        }
        buf = replay.add_episode(buf, ep, jnp.ones((T,), bool))
        path = str(tmp_path / "img_buf.npz")
        save_npz(buf, path)
        buf2 = load_npz(path, buffer_size=64, num_points=70)
        assert buf2.image_state.shape == buf.image_state.shape
        np.testing.assert_allclose(
            np.asarray(buf2.image_state[:T], np.float32),
            np.asarray(buf.image_state[:T], np.float32),
            atol=2e-3,  # f16 on disk
        )
        batch = replay.sample(buf2, jax.random.PRNGKey(0), 8,
                              episode_max_len=4)
        assert batch["image_state"].shape == (8, 5, S, S)


class TestDomainRandomization:
    """Per-episode visual randomization (VERDICT round-1 item 6;
    reference randomizes table/object textures per episode,
    reference: env/panda_scene.py:599-618,680-690)."""

    def _env(self):
        from gaddpg_tpu.envs.assets import box_asset
        from gaddpg_tpu.envs.grasp_env import EnvParams, PandaGraspEnv
        from gaddpg_tpu.render.camera import CameraParams

        p = EnvParams(
            camera=CameraParams(width=S, height=S),
            use_image=True, domain_rand=True, reset_tries=1,
            use_planner=False,
        )
        return PandaGraspEnv(p, box_asset(0.06, 0.06, 0.14))

    def test_per_key_determinism_and_episode_variation(self):
        env = self._env()
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(4))
        # same key -> identical image (randomization is PRNG-keyed)
        _, obs2 = jax.jit(env.reset)(jax.random.PRNGKey(4))
        np.testing.assert_array_equal(np.asarray(obs.image),
                                      np.asarray(obs2.image))

        # different vis_seed, SAME scene -> RGB changes, depth/mask don't
        reobserve = jax.jit(lambda s, k: env._observe(s, k))
        k_obs = jax.random.PRNGKey(7)
        st_a = state.replace(vis_seed=jnp.asarray(111, jnp.int32),
                             pc=state.pc)
        st_b = state.replace(vis_seed=jnp.asarray(222, jnp.int32))
        _, obs_a = reobserve(st_a, k_obs)
        _, obs_b = reobserve(st_b, k_obs)
        rgb_delta = float(jnp.abs(obs_a.image[:3] - obs_b.image[:3]).max())
        assert rgb_delta > 0.05, "randomization has no visual effect"
        np.testing.assert_array_equal(np.asarray(obs_a.image[3:]),
                                      np.asarray(obs_b.image[3:]))

    def test_disabled_randomization_is_deterministic_per_object(self):
        from gaddpg_tpu.envs.assets import box_asset
        from gaddpg_tpu.envs.grasp_env import EnvParams, PandaGraspEnv
        from gaddpg_tpu.render.camera import CameraParams

        p = EnvParams(
            camera=CameraParams(width=S, height=S),
            use_image=True, domain_rand=False, reset_tries=1,
            use_planner=False,
        )
        env = PandaGraspEnv(p, box_asset(0.06, 0.06, 0.14))
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(4))
        k_obs = jax.random.PRNGKey(7)
        reobserve = jax.jit(lambda s, k: env._observe(s, k))
        _, obs_a = reobserve(state.replace(vis_seed=jnp.asarray(1, jnp.int32)), k_obs)
        _, obs_b = reobserve(state.replace(vis_seed=jnp.asarray(2, jnp.int32)), k_obs)
        np.testing.assert_array_equal(np.asarray(obs_a.image),
                                      np.asarray(obs_b.image))


def _synthetic_resnet18_sd(seed=0):
    """Torchvision-resnet18-shaped state dict with random values
    (zero-egress stands in for the real download; key names and shapes
    are the torchvision contract the loader maps from)."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[name] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.standard_normal(c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = (
            np.abs(rng.standard_normal(c)) + 0.5
        ).astype(np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    inc = 64
    for stage, ch in enumerate((64, 128, 256, 512)):
        for b in range(2):
            p = f"layer{stage + 1}.{b}"
            conv(p + ".conv1.weight", ch, inc if b == 0 else ch, 3)
            bn(p + ".bn1", ch)
            conv(p + ".conv2.weight", ch, ch, 3)
            bn(p + ".bn2", ch)
            if b == 0 and stage > 0:
                conv(p + ".downsample.0.weight", ch, inc, 1)
                bn(p + ".downsample.1", ch)
            inc = ch
    sd["fc.weight"] = rng.standard_normal((1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.standard_normal(1000).astype(np.float32)
    return sd


class TestPretrainedLoad:
    """torchvision state-dict ingestion (reference: core/networks.py:38-58
    zero-extended conv1 + strict=False load)."""

    def test_load_torch_state_maps_and_extends(self):
        from gaddpg_tpu.models.resnet import ResNet18Feature, load_torch_state

        sd = _synthetic_resnet18_sd()
        model = ResNet18Feature()
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 5, S, S)), train=False)
        loaded = load_torch_state(variables, sd)

        stem = np.asarray(loaded["params"]["Conv_0"]["kernel"])  # (7,7,5,64)
        np.testing.assert_allclose(
            stem[:, :, :3, :], np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
            rtol=1e-6)
        assert np.all(stem[:, :, 3:, :] == 0.0)  # zero-extended channels

        # layer3.0 (stride-2, downsample) lands on BasicBlock_4.Conv_2
        blk = loaded["params"]["BasicBlock_4"]
        np.testing.assert_allclose(
            np.asarray(blk["Conv_2"]["kernel"]),
            np.transpose(sd["layer3.0.downsample.0.weight"], (2, 3, 1, 0)),
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(loaded["batch_stats"]["BasicBlock_4"]["BatchNorm_2"]["mean"]),
            sd["layer3.0.downsample.1.running_mean"], rtol=1e-6)

        out = model.apply(loaded, jnp.ones((2, 5, S, S)), train=False)
        assert out.shape == (2, 512) and bool(jnp.all(jnp.isfinite(out)))

    def test_agent_state_pretrained_init(self, tmp_path):
        sd = _synthetic_resnet18_sd(seed=3)
        path = str(tmp_path / "resnet18.npz")
        np.savez(path, **sd)

        cfg = AgentConfig(use_image=True, image_size=S, batch_size=2,
                          pretrained_resnet=path)
        state = create_agent_state(jax.random.PRNGKey(0), cfg, npoints=70)
        want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
        for enc in ("encoder", "value_encoder"):
            got = np.asarray(state.feat_params[enc]["Conv_0"]["kernel"])
            np.testing.assert_allclose(got[:, :, :3, :], want, rtol=1e-6)

    def test_export_round_trip(self):
        """export_torch_state is load_torch_state's exact inverse: a
        sim-trained encoder survives the .npz interchange bit-for-bit
        (the zero-egress substitute for ImageNet weights)."""
        from gaddpg_tpu.models.resnet import (
            ResNet18Feature, export_torch_state, load_torch_state,
        )

        model = ResNet18Feature()
        variables = model.init(jax.random.PRNGKey(7),
                               jnp.zeros((1, 5, S, S)), train=False)
        sd = export_torch_state(variables)
        # 5-channel conv1 exports at full width (no truncation)
        assert sd["conv1.weight"].shape == (64, 5, 7, 7)
        back = load_torch_state(variables, sd)
        for tree_a, tree_b in ((variables["params"], back["params"]),
                               (variables["batch_stats"],
                                back["batch_stats"])):
            la = jax.tree_util.tree_leaves(tree_a)
            lb = jax.tree_util.tree_leaves(tree_b)
            assert len(la) == len(lb)
            for a, b in zip(la, lb):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
