"""Mesh import pipeline, grasp dataset, scene determinism."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from gaddpg_tpu.data import mesh_import as mi
from gaddpg_tpu.data import mesh_native as mn
from gaddpg_tpu.data.grasp_dataset import GraspDatasetGenerator
from gaddpg_tpu.envs import EnvParams, PandaGraspEnv, box_asset
from gaddpg_tpu.envs.assets import library_from_index
from gaddpg_tpu.envs.scenes import generate_scenes, load_scenes, save_scenes


def box_tris(hx, hy, hz):
    v = np.array(list(itertools.product([-hx, hx], [-hy, hy], [-hz, hz])),
                 np.float32)
    faces = [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5), (0, 4, 5), (0, 5, 1),
             (2, 3, 7), (2, 7, 6), (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3)]
    return v[np.array(faces)]


class TestMeshPipeline:
    def test_voxel_occupancy_box(self):
        tris = box_tris(0.03, 0.03, 0.03)
        occ = mn.voxel_occupancy(tris, [-0.04] * 3, [0.04] * 3, 16)
        # interior fraction approx (0.06/0.08)^3 = 0.42
        frac = occ.mean()
        assert 0.3 < frac < 0.55, frac

    def test_sphere_pack_inside(self):
        tris = box_tris(0.025, 0.025, 0.05)
        a = mi.asset_from_mesh(tris, mass=0.1, res=16)
        s = a["spheres"]
        assert len(s) >= 4
        # centers inside, radius no larger than the half extents + pad
        assert np.all(np.abs(s[:, 0]) <= 0.026)
        assert np.all(s[:, 3] > 0)
        assert np.all(s[:, 3] <= 0.03)

    def test_surface_samples_on_surface(self):
        tris = box_tris(0.02, 0.02, 0.02)
        pts = mn.surface_sample(tris, 256, seed=1)
        on_face = np.isclose(np.abs(pts), 0.02, atol=1e-5).any(axis=1)
        assert on_face.mean() > 0.99

    def test_obj_roundtrip(self, tmp_path):
        path = str(tmp_path / "box.obj")
        tris = box_tris(0.02, 0.03, 0.04)
        with open(path, "w") as f:
            verts = tris.reshape(-1, 3)
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for i in range(0, len(verts), 3):
                f.write(f"f {i+1} {i+2} {i+3}\n")
        loaded = mi.load_obj(path)
        np.testing.assert_allclose(loaded, tris, atol=1e-6)

    def test_extend_library(self):
        lib = library_from_index("ycb", "train")
        tris = box_tris(0.02, 0.02, 0.05)
        entry = mi.asset_from_mesh(tris, mass=0.15, res=12)
        lib2 = mi.extend_library(lib, [entry], ["custom_box"])
        assert lib2.num_objects == lib.num_objects + 1
        assert lib2.spheres.shape[0] == lib.spheres.shape[0] + 1
        assert lib2.names[-1] == "custom_box"

    def test_library_save_load_round_trip(self, tmp_path):
        """save_library/load_library preserve every padded array --
        the mesh-index load cache depends on it."""
        from gaddpg_tpu.envs.assets import (
            _LIB_ARRAY_FIELDS, load_library, save_library,
        )

        lib = library_from_index("ycb", "train")
        path = str(tmp_path / "lib.npz")
        save_library(lib, path)
        back = load_library(path)
        assert back.names == lib.names
        for k in _LIB_ARRAY_FIELDS:
            a, b = np.asarray(getattr(lib, k)), np.asarray(getattr(back, k))
            assert a.dtype == b.dtype and a.shape == b.shape, k
            np.testing.assert_array_equal(a, b, err_msg=k)


class TestGraspDataset:
    def test_batch_shapes_and_labels(self):
        gen = GraspDatasetGenerator(box_asset(0.05, 0.05, 0.12))
        b = gen.sample(jax.random.PRNGKey(0), batch=16)
        assert b["cloud"].shape == (16, 512, 3)
        assert b["grasp"].shape == (16, 7)
        labels = np.asarray(b["label"])
        assert set(np.unique(labels)) <= {0.0, 1.0}
        # both classes present in a 16 batch with high probability
        assert 0 < labels.sum() < 16

    def test_positive_grasps_near_db(self):
        lib = box_asset(0.05, 0.05, 0.12)
        gen = GraspDatasetGenerator(lib)
        b = gen.sample(jax.random.PRNGKey(3), batch=32)
        pos = np.asarray(b["label"]) > 0.5
        t = np.asarray(b["grasp"][:, 4:7])
        db_t = np.asarray(lib.grasps[0, :, :3, 3])
        valid = np.asarray(lib.grasp_valid[0])
        for ti in t[pos]:
            d = np.linalg.norm(db_t[valid] - ti, axis=-1).min()
            assert d < 0.05, d


class TestScenes:
    def test_generate_save_load_deterministic_eval(self, tmp_path):
        env = PandaGraspEnv(EnvParams(), box_asset(0.05, 0.05, 0.12))
        scenes = generate_scenes(env, jax.random.PRNGKey(0), 4, oversample=2)
        assert len(scenes["obj_idx"]) == 4
        path = str(tmp_path / "scenes.npz")
        save_scenes(scenes, path)
        loaded = load_scenes(path)
        np.testing.assert_allclose(
            np.asarray(loaded["joints"]), np.asarray(scenes["joints"]), atol=1e-6
        )
        # reset_scene is deterministic given (scene, key)
        s1, o1 = jax.jit(env.reset_scene)(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x[0]), loaded),
            jax.random.PRNGKey(7),
        )
        s2, o2 = jax.jit(env.reset_scene)(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x[0]), loaded),
            jax.random.PRNGKey(7),
        )
        np.testing.assert_allclose(
            np.asarray(o1.point_state), np.asarray(o2.point_state)
        )


class TestReferenceFormats:
    """Reference-file compatibility: scene .mat import and the buffer
    .npz layout (reference: core/train_test_offline.py:181-184,
    core/replay_memory.py:274-356)."""

    def test_mat_scene_import(self, tmp_path):
        from scipy.io import savemat

        from gaddpg_tpu.envs.scenes import import_mat_scene

        path = str(tmp_path / "scene_0.mat")
        pose = np.array([0.55, 0.05, 0.06, 1.0, 0.0, 0.0, 0.0], np.float32)
        joints = np.array([0.0, -1.2, 0.0, -2.6, 0.0, 1.7, 0.8], np.float32)
        savemat(path, {"pose": pose, "joints": joints,
                       "target_name": "proxy_box"})
        scene = import_mat_scene(path, name_to_idx={"proxy_box": 3})
        np.testing.assert_allclose(scene["obj_pos"][0], pose[:3], atol=1e-6)
        np.testing.assert_allclose(scene["obj_quat"][0], pose[3:7], atol=1e-6)
        np.testing.assert_allclose(scene["joints"][0], joints, atol=1e-6)

    def test_mat_scene_reference_layout(self, tmp_path):
        # the ACTUAL reference scene_{k}.mat layout (VERDICT round-3
        # item 5): pose = (N, 4, 4) matrices, path = object dirs with
        # the TARGET FIRST, optional init_joints
        # (reference: env/panda_scene.py:628-668)
        from scipy.io import savemat

        from gaddpg_tpu.envs.scenes import import_mat_scene

        path = str(tmp_path / "scene_7.mat")
        rot_z90 = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
        poses = np.tile(np.eye(4), (3, 1, 1))
        poses[0, :3, :3] = rot_z90
        poses[0, :3, 3] = [0.58, -0.04, 0.06]
        joints = np.array([0.1, -1.0, 0.0, -2.4, 0.0, 1.6, 0.7])
        savemat(path, {
            "pose": poses,
            "path": np.array([  # cell array of object directories
                "data/objects/025_mug/",
                "data/objects/Table/",
                "data/objects/floor/",
            ], dtype=object),
            "init_joints": joints,
        })
        scene = import_mat_scene(path, name_to_idx={"025_mug": 5})
        assert int(scene["obj_idx"][0]) == 5
        np.testing.assert_allclose(scene["obj_pos"][0],
                                   [0.58, -0.04, 0.06], atol=1e-6)
        half = np.sqrt(0.5)
        np.testing.assert_allclose(np.abs(scene["obj_quat"][0]),
                                   [half, 0, 0, half], atol=1e-6)
        np.testing.assert_allclose(scene["joints"][0], joints, atol=1e-6)

        # without init_joints the import falls back to the default arm
        savemat(path, {"pose": poses, "path": np.array(["data/objects/x/"],
                                                       dtype=object)})
        scene = import_mat_scene(path)
        assert scene["joints"].shape == (1, 7)
        assert np.isfinite(scene["joints"]).all()

    def test_mat_scene_reference_layout_resets_env(self, tmp_path):
        from scipy.io import savemat

        from gaddpg_tpu.envs.scenes import import_mat_scene

        path = str(tmp_path / "scene_9.mat")
        poses = np.tile(np.eye(4), (1, 1, 1))
        poses[0, :3, 3] = [0.55, 0.0, 0.07]
        savemat(path, {"pose": poses,
                       "path": np.array(["data/objects/box/"], dtype=object),
                       "init_joints": np.array(
                           [0.0, -0.8, 0.0, -2.2, 0.0, 1.6, 0.8])})
        scene = import_mat_scene(path, name_to_idx={"box": 0})
        env = PandaGraspEnv(EnvParams(), box_asset(0.05, 0.05, 0.14))
        s = {k: jnp.asarray(np.asarray(v)[0]) for k, v in scene.items()}
        state, obs = jax.jit(env.reset_scene)(s, jax.random.PRNGKey(0))
        assert obs.point_state.shape == (4, 1030)
        assert abs(float(state.phys.obj.pos[0]) - 0.55) < 0.02

    def test_mat_scene_resets_env(self, tmp_path):
        from scipy.io import savemat

        from gaddpg_tpu.envs.scenes import import_mat_scene

        path = str(tmp_path / "scene_1.mat")
        savemat(path, {
            "obj_poses": np.array([0.55, 0.0, 0.07, 1.0, 0, 0, 0], np.float32),
            "init_joints": np.array([0.0, -0.8, 0.0, -2.2, 0.0, 1.6, 0.8],
                                    np.float32),
        })
        scene = import_mat_scene(path)
        env = PandaGraspEnv(EnvParams(), box_asset(0.05, 0.05, 0.14))
        s = {k: jnp.asarray(np.asarray(v)[0]) for k, v in scene.items()}
        state, obs = jax.jit(env.reset_scene)(s, jax.random.PRNGKey(0))
        assert obs.point_state.shape == (4, 1030)
        assert abs(float(state.phys.obj.pos[0]) - 0.55) < 0.02

    def test_reference_npz_action_shape(self, tmp_path):
        # the reference stores actions as (N, 1, 6)
        # (reference: core/replay_memory.py:368-373)
        from gaddpg_tpu import replay

        n, pts = 24, 70
        ep_map = np.repeat(np.arange(2) * 12 + 11, 12)
        data = {
            "point_state": np.random.RandomState(0).randn(n, 4, pts),
            "action": np.random.RandomState(1).rand(n, 1, 6),
            "expert_action": np.random.RandomState(2).rand(n, 1, 6),
            "reward": np.zeros(n), "terminal": np.zeros(n),
            "timestep": np.tile(np.arange(12), 2).astype(np.float64),
            "returns": np.zeros(n),
            "state_pose": np.tile(np.eye(4), (n, 1, 1)),
            "collide": np.zeros(n), "grasp": np.zeros(n),
            "perturb_flags": np.zeros(n),
            "goal": np.zeros((n, 7)), "expert_flags": np.ones(n),
            "target_idx": np.zeros(n), "episode_map": ep_map,
            "cur_idx": 24,
        }
        path = str(tmp_path / "ref_buffer.npz")
        np.savez(path, **data)
        buf = replay.load_npz(path, buffer_size=64, num_points=pts)
        assert buf.action.shape == (64, 6)
        np.testing.assert_allclose(
            np.asarray(buf.action[:n]), data["action"][:, 0], atol=1e-6
        )
        assert int(buf.filled) == 24
        batch = replay.sample(buf, jax.random.PRNGKey(0), 8, episode_max_len=4)
        assert batch["action"].shape == (8, 6)


    def test_reference_npz_full_dump(self, tmp_path):
        # a dump shaped EXACTLY like the reference's data_50k.npz
        # (VERDICT round-3 item 5): float64 (B, 4, 1030) point clouds,
        # (N, 1, 6) actions, the full attr_names key set incl. pose /
        # image_state(None) / is_full / total_env_step
        # (reference: core/replay_memory.py:33-50, 338-356)
        from gaddpg_tpu import replay

        n, pts = 48, 1030
        rng = np.random.RandomState(3)
        ep_map = np.repeat(np.arange(4) * 12 + 11, 12)
        rew = np.zeros(n)
        rew[11::12] = 1.0
        data = {
            "action": rng.uniform(-0.05, 0.05, (n, 1, 6)),
            "pose": np.tile(np.eye(4), (n, 1, 1)),        # ignored key
            "point_state": rng.randn(n, 4, pts).astype(np.float64),
            "target_idx": np.zeros(n),
            "reward": rew,
            "terminal": np.zeros(n),
            "timestep": np.tile(np.arange(12), 4).astype(np.float64),
            "returns": np.zeros(n),
            "state_pose": np.tile(np.eye(4), (n, 1, 1)),
            "image_state": np.array(None, dtype=object),  # no-image dump
            "collide": np.zeros(n),
            "grasp": np.zeros(n),
            "perturb_flags": np.zeros(n),
            "goal": np.zeros((n, 7)),
            "expert_flags": np.ones(n),
            "expert_action": rng.uniform(-0.05, 0.05, (n, 1, 6)),
            "episode_map": ep_map,
            "is_full": False,
            "cur_idx": n,
            "total_env_step": 4 * 26,
        }
        path = str(tmp_path / "data_50k.npz")
        np.savez(path, **data)
        buf = replay.load_npz(path, buffer_size=128, num_points=pts)
        assert int(buf.filled) == n
        assert buf.point_state.shape == (128, 4, pts)
        np.testing.assert_allclose(
            np.asarray(buf.point_state[:n], np.float64),
            data["point_state"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(buf.action[:n]),
                                   data["action"][:, 0], atol=1e-6)
        # collide_future was absent from the dump -> backfilled zeros
        np.testing.assert_array_equal(np.asarray(buf.collide_future[:n]), 0)
        batch = replay.sample(buf, jax.random.PRNGKey(1), 16,
                              episode_max_len=12)
        assert batch["point_state"].shape == (16, 4, pts)
        assert np.isfinite(np.asarray(batch["return"])).all()

        # round-trip: our save_npz output loads back identically
        out = str(tmp_path / "resave.npz")
        replay.save_npz(buf, out)
        buf2 = replay.load_npz(out, buffer_size=128, num_points=pts)
        np.testing.assert_allclose(np.asarray(buf2.point_state[:n]),
                                   np.asarray(buf.point_state[:n]))
        assert int(buf2.filled) == int(buf.filled)


class TestGraspFileIngestion:
    """ACRONYM h5 / 6dof-graspnet JSON grasp datasets
    (reference: misc/grasp_data_reader.py:607-700)."""

    def _synthetic_grasps(self, n=20):
        # top-down grasps around a box at the origin
        rng = np.random.RandomState(0)
        T = np.tile(np.eye(4), (n, 1, 1))
        T[:, :3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], float)
        T[:, 0, 3] = rng.uniform(-0.01, 0.01, n)
        T[:, 2, 3] = 0.02 + 0.1034  # closing point at box top
        return T

    def test_json_roundtrip(self, tmp_path):
        import json as _json

        from gaddpg_tpu.data.grasp_files import read_grasp_file

        T = self._synthetic_grasps()
        q = np.concatenate([np.ones(12), np.zeros(8)])
        path = str(tmp_path / "box_grasps.json")
        _json.dump({
            "object": "meshes/box.obj", "object_scale": 1.0,
            "transforms": T.tolist(),
            "quality_flex_object_in_gripper": q.tolist(),
        }, open(path, "w"))
        g = read_grasp_file(path)
        assert g["transforms"].shape == (20, 4, 4)
        assert g["positive"].sum() == 12
        # frame conversion shifts the origin by +0.0034 along the grasp
        # +z axis, which points world-down for a top-down grasp
        np.testing.assert_allclose(
            g["transforms"][0, 2, 3], T[0, 2, 3] - 0.0034, atol=1e-5
        )

    def test_h5_roundtrip(self, tmp_path):
        import h5py

        from gaddpg_tpu.data.grasp_files import read_grasp_file

        T = self._synthetic_grasps()
        q = np.concatenate([np.ones(15), np.zeros(5)])
        path = str(tmp_path / "box.h5")
        with h5py.File(path, "w") as f:
            f["grasps/transforms"] = T
            f["grasps/qualities/flex/object_in_gripper"] = q
            f["object/file"] = np.bytes_(b"meshes/box.obj")
            f["object/scale"] = 1.0
        g = read_grasp_file(path)
        assert g["positive"].sum() == 15
        assert g["scale"] == 1.0
        assert g["object_path"] == "meshes/box.obj"

    def test_entry_from_grasp_file(self, tmp_path):
        import h5py

        from gaddpg_tpu.data.grasp_files import entry_from_grasp_file

        T = self._synthetic_grasps()
        path = str(tmp_path / "box.h5")
        with h5py.File(path, "w") as f:
            f["grasps/transforms"] = T
            f["grasps/qualities/flex/object_in_gripper"] = np.ones(len(T))
        tris = box_tris(0.03, 0.03, 0.02)
        entry = entry_from_grasp_file(path, mesh_tris=tris, mass=0.1, res=12)
        assert entry["grasps"] is not None and len(entry["grasps"]) > 0
        assert entry["spheres"].shape[1] == 4
        # grasps survived the pad-squeeze validation against the spheres
        lib = library_from_index("ycb", "train")
        lib2 = mi.extend_library(lib, [entry], ["acronym_box"])
        assert lib2.names[-1] == "acronym_box"


class TestMeshIndex:
    """filter_shapenet-style mesh index -> library
    (reference: experiments/object_index/filter_shapenet.json,
    env/panda_scene.py:523-573)."""

    def test_index_json_builds_library(self, tmp_path):
        import json as _json

        from gaddpg_tpu.envs.assets import library_from_index

        # write two meshes + an index file
        for name, dims in (("boxy", (0.025, 0.025, 0.05)),
                           ("slab", (0.04, 0.02, 0.035))):
            tris = box_tris(*dims).reshape(-1, 3)
            with open(tmp_path / f"{name}.obj", "w") as f:
                for v in tris:
                    f.write(f"v {v[0]} {v[1]} {v[2]}\n")
                for i in range(0, len(tris), 3):
                    f.write(f"f {i+1} {i+2} {i+3}\n")
        idx = {
            "train": [
                {"name": "boxy", "obj": "boxy.obj", "mass": 0.1},
                {"name": "slab", "obj": "slab.obj"},
            ],
            "test": [{"name": "slab", "obj": "slab.obj"}],
        }
        ipath = str(tmp_path / "mesh_index.json")
        _json.dump(idx, open(ipath, "w"))
        lib = library_from_index(ipath, "train")
        assert lib.num_objects == 2
        assert lib.names == ["boxy", "slab"]
        assert bool(lib.grasp_valid.any())  # antipodal grasps generated
        lib_t = library_from_index(ipath, "test")
        assert lib_t.num_objects == 1
        # the library drives an env end to end
        env = PandaGraspEnv(EnvParams(reset_tries=1), lib)
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        assert obs.point_state.shape == (4, 1030)


class TestVideoUtils:
    def test_rgbdm_to_rgb_and_strip(self, tmp_path):
        from gaddpg_tpu.utils.video import rgbdm_to_rgb, write_strip, write_video

        frames = np.zeros((5, 5, 16, 16), np.float32)
        frames[:, :3] = 0.5
        frames[:, 3] = 0.4
        frames[:, 4] = 1.0
        frames[2, 4, 4:12, 4:12] = 0.0  # target blob in frame 2
        img = rgbdm_to_rgb(frames[2])
        assert img.shape == (16, 48, 3) and img.dtype == np.uint8
        # mask panel: target pixels white
        assert img[8, 32 + 8, 0] == 255 and img[0, 32, 0] == 0
        p = write_strip(frames, str(tmp_path / "strip.png"))
        assert (tmp_path / "strip.png").exists()
        write_video(frames, str(tmp_path / "clip.gif"), fps=4)
        assert (tmp_path / "clip.gif").exists()


class TestLibraryGraspVerification:
    def test_verify_library_masks_but_never_empties(self):
        # verify_library_grasps ANDs the physics close-and-hold verdict
        # into grasp_valid; objects where nothing survives keep their
        # analytic set (an ungraspable object would poison every scene
        # that samples it)
        import numpy as np

        from gaddpg_tpu.envs.assets import (
            AssetSpec, build_library, verify_library_grasps,
        )

        lib = build_library([
            AssetSpec("vbox", "box", (0.05, 0.05, 0.10), 0.2),
            AssetSpec("vcyl", "cylinder", (0.03, 0.10), 0.3),
        ])
        out = verify_library_grasps(lib)
        gv0 = np.asarray(lib.grasp_valid)
        gv1 = np.asarray(out.grasp_valid)
        # mask only ever shrinks, per object something always remains
        assert (gv1 & ~gv0).sum() == 0
        assert gv1.any(axis=1).all()
        # geometry untouched
        np.testing.assert_array_equal(
            np.asarray(out.spheres), np.asarray(lib.spheres)
        )
