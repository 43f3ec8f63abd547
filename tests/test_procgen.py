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

    def test_sphere_pack_native_numpy_parity(self):
        # advisor round-3 item 1: the native kernel and the numpy
        # fallback must produce the SAME packing on real mesh grids,
        # else a stale/missing .so silently changes every asset
        import pytest

        from gaddpg_tpu.data import mesh_native as mn

        if not mn.native_available():
            pytest.skip("native mesh_tools not built on this host")
        for seed in (0, 1, 7):
            tris, _ = random_proc_mesh(seed)
            lo = tris.reshape(-1, 3).min(0) - 1e-3
            hi = tris.reshape(-1, 3).max(0) + 1e-3
            res = 20
            occ = mn.voxel_occupancy(tris, lo, hi, res)
            dist = mn.surface_distance_grid(tris, lo, hi, res)
            a = mn.sphere_pack(occ, dist, lo, hi, 16, 1e-3)
            b = mn._sphere_pack_numpy(occ, dist, lo, hi, 16, 1e-3)
            assert a.shape == b.shape, (seed, a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=str(seed))

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

    def test_seed_index_roundtrip(self, tmp_path):
        # the repo-shippable proc_shapenet_1216.json format: seeds +
        # grasp manifest, no OBJ files (VERDICT round-3 item 7)
        import json

        import pytest

        from gaddpg_tpu.data.procgen import export_proc_seed_index
        from gaddpg_tpu.envs.assets import library_from_index

        p = os.path.join(tmp_path, "idx.json")
        export_proc_seed_index(p, 2, 1, seed0=0, log_every=0)
        with open(p) as f:
            idx = json.load(f)
        assert idx["format"] == "proc_seed_index"
        assert len(idx["train"]) == 2 and len(idx["test"]) == 1
        assert all(e["grasps"] > 0 for e in idx["train"] + idx["test"])
        lib = library_from_index(p, split="train")
        assert lib.num_objects == 2
        assert bool(np.asarray(lib.grasp_valid).any(axis=1).all())
        # a PACKING_VERSION mismatch must refuse to build silently
        idx["packing_version"] = 999
        with open(p, "w") as f:
            json.dump(idx, f)
        with pytest.raises(ValueError):
            library_from_index(p, split="train")
