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
