"""Procedural ShapeNet-scale object sweep (data/procgen.py).

Every generated shape must survive the same native mesh pipeline real
OBJ assets take (voxel fill -> sphere pack -> surface sample ->
antipodal grasps + pad-squeeze validation), and the resulting library
must be usable by the env. Reference analogue: the filter_shapenet.json
object sweep (reference: env/panda_scene.py:523-573).
"""

import os

import numpy as np

from gaddpg_tpu.data.procgen import (
    build_proc_library,
    export_proc_index,
    random_proc_mesh,
    write_obj,
)


class TestProcMeshes:
    def test_families_deterministic_and_closed(self):
        for seed in range(3):
            t1, f1 = random_proc_mesh(seed)
            t2, f2 = random_proc_mesh(seed)
            assert f1 == f2
            np.testing.assert_array_equal(t1, t2)
            assert len(t1) >= 24  # composites: 12 tris per cuboid
            ext = t1.reshape(-1, 3).max(0) - t1.reshape(-1, 3).min(0)
            assert (ext > 0.01).all() and (ext < 0.5).all()

    def test_library_builds_with_grasps(self):
        lib = build_proc_library(4, seed0=0)
        assert lib.num_objects == 4
        # every kept object has validated grasps and a live sphere set
        assert bool(np.asarray(lib.grasp_valid).any(axis=1).all())
        assert (np.asarray(lib.spheres)[..., 3] > 0).any(axis=1).all()
        assert (np.asarray(lib.coarse_spheres)[..., 3] > 0).any(axis=1).all()
        assert (np.asarray(lib.rest_height) > 0.005).all()

    def test_obj_roundtrip_and_index(self, tmp_path):
        from gaddpg_tpu.data.mesh_import import load_obj
        from gaddpg_tpu.envs.assets import library_from_index

        tris, _ = random_proc_mesh(0)
        p = os.path.join(tmp_path, "m.obj")
        write_obj(p, tris)
        tris2 = load_obj(p)
        assert tris2.shape == tris.shape
        # vertex set survives the file round trip
        v1 = np.unique(np.round(tris.reshape(-1, 3), 5), axis=0)
        v2 = np.unique(np.round(tris2.reshape(-1, 3), 5), axis=0)
        np.testing.assert_allclose(v1, v2, atol=1e-4)

        idx = export_proc_index(str(tmp_path), 2, 1, seed0=0)
        lib = library_from_index(idx, split="train")
        assert lib.num_objects == 2
