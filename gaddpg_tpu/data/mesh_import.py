"""Mesh -> simulable asset: OBJ loading and library-entry construction.

Covers the reference's external asset path (YCB/ShapeNet
`model_normalized.obj` + urdf, reference: env/panda_scene.py:546-552,
misc/convert_graspnet_grasp.py): given a triangle mesh, produce the
sphere set, surface samples, extents, inertia and an antipodal grasp
set compatible with `ObjectLibrary`.
"""

from typing import List, Optional, Tuple

import numpy as np

from gaddpg_tpu.data.mesh_native import (
    sphere_pack,
    surface_distance_grid,
    surface_sample,
    voxel_occupancy,
)


def load_obj(path: str, scale: float = 1.0) -> np.ndarray:
    """Minimal OBJ parser -> (n_tri, 3, 3) float32 triangles.

    Supports v / f lines with polygonal faces (fan-triangulated) and
    v/vt/vn index syntax.
    """
    verts: List[Tuple[float, float, float]] = []
    tris: List[Tuple[int, int, int]] = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):
                    tris.append((idx[0], idx[k], idx[k + 1]))
    v = np.asarray(verts, np.float32) * scale
    t = np.asarray(tris, np.int64)
    return v[t]


def asset_from_mesh(tris: np.ndarray, mass: Optional[float] = None,
                    density: float = 300.0, res: int = 24,
                    max_spheres: int = 32, num_surface: int = 1024,
                    grasps: Optional[np.ndarray] = None, seed: int = 0):
    """Build library-entry arrays from triangles (n, 3, 3).

    Returns dict(spheres (NS,4), surface (NP,3), extents (3,), mass,
    inertia (3,), grasps (G,4,4) or box-style fallback, rest_height).
    `grasps` can carry an external grasp DB (e.g. converted ACRONYM
    poses); otherwise antipodal candidates are generated from surface
    normals like assets.py does for primitives.
    """
    lo = tris.reshape(-1, 3).min(axis=0)
    hi = tris.reshape(-1, 3).max(axis=0)
    pad = 0.02 * (hi - lo).max() + 1e-4
    lo_p, hi_p = lo - pad, hi + pad

    occ = voxel_occupancy(tris, lo_p, hi_p, res)
    dist = surface_distance_grid(tris, lo_p, hi_p, res)
    spheres = sphere_pack(occ, dist, lo_p, hi_p, max_spheres=max_spheres)
    surface = surface_sample(tris, num_surface, seed=seed)

    extents = (hi - lo).astype(np.float32)
    volume = float(occ.mean()) * float(np.prod(hi_p - lo_p))
    m = float(mass) if mass is not None else max(volume * density, 0.02)
    # inertia of the bounding box as a robust estimate
    inertia = m / 12.0 * np.array(
        [
            extents[1] ** 2 + extents[2] ** 2,
            extents[0] ** 2 + extents[2] ** 2,
            extents[0] ** 2 + extents[1] ** 2,
        ],
        np.float32,
    )
    inertia = np.maximum(inertia, 1e-5)
    rest_height = float(-lo[2])
    return {
        "spheres": spheres,
        "surface": surface,
        "extents": extents,
        "mass": m,
        "inertia": inertia,
        "grasps": grasps,
        "rest_height": rest_height,
    }


def extend_library(lib, entries, names):
    """Append mesh-derived entries to an ObjectLibrary (padded)."""
    import jax.numpy as jnp

    from gaddpg_tpu.envs.assets import NG, NP, NS, ObjectLibrary

    def pad_rows(a, n, fill=0.0):
        out = np.full((n,) + a.shape[1:], fill, np.float32)
        out[: min(len(a), n)] = a[:n]
        return out

    sph, surf, ext, mass, inert, gr, gv, rh = [], [], [], [], [], [], [], []
    for e in entries:
        s = pad_rows(e["spheres"], NS)
        s[len(e["spheres"]):, 2] = 1e3  # park padding spheres
        sph.append(s)
        sp = e["surface"]
        if len(sp) < NP:
            sp = np.concatenate([sp, sp[np.arange(NP - len(sp)) % len(sp)]])
        surf.append(sp[:NP])
        ext.append(e["extents"])
        mass.append(e["mass"])
        inert.append(e["inertia"])
        g = np.tile(np.eye(4, dtype=np.float32), (NG, 1, 1))
        v = np.zeros(NG, bool)
        if e["grasps"] is not None:
            k = min(len(e["grasps"]), NG)
            g[:k] = e["grasps"][:k]
            v[:k] = True
        gr.append(g)
        gv.append(v)
        rh.append(e["rest_height"])

    cat = lambda a, b: jnp.concatenate([a, jnp.asarray(np.stack(b))])
    return ObjectLibrary(
        names=lib.names + list(names),
        spheres=cat(lib.spheres, sph),
        surface_points=cat(lib.surface_points, surf),
        extents=cat(lib.extents, ext),
        mass=jnp.concatenate([lib.mass, jnp.asarray(mass)]),
        inertia=cat(lib.inertia, inert),
        grasps=cat(lib.grasps, gr),
        grasp_valid=cat(lib.grasp_valid, gv),
        rest_height=jnp.concatenate([lib.rest_height, jnp.asarray(rh)]),
    )
