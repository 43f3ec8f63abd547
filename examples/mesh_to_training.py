"""Real-mesh pipeline: OBJ -> native voxel/sphere-pack/SDF/sampling ->
library entry -> expert rollout success.

Exercises the full external-asset path the reference uses for
YCB/ShapeNet models (reference: env/panda_scene.py:523-573): a
non-trivial watertight mesh (mug: solid cylinder + handle) is written
to OBJ, parsed back, converted through native/mesh_tools.cc, appended
to the object library with antipodal grasps generated from its surface,
and grasped by the expert.

    JAX_PLATFORMS=cpu python examples/mesh_to_training.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_mug_obj(path, r=0.032, h=0.09, handle_r=0.025, tube_r=0.007,
                 nseg=24):
    """Watertight mug: solid cylinder body + half-torus handle."""
    verts, faces = [], []

    def add_cyl(cx, cz):
        base = len(verts)
        for k in range(nseg):
            a = 2 * np.pi * k / nseg
            verts.append((cx + r * np.cos(a), r * np.sin(a), 0.0))
            verts.append((cx + r * np.cos(a), r * np.sin(a), h))
        bot = len(verts); verts.append((cx, 0.0, 0.0))
        top = len(verts); verts.append((cx, 0.0, h))
        for k in range(nseg):
            k2 = (k + 1) % nseg
            b0, t0 = base + 2 * k, base + 2 * k + 1
            b1, t1 = base + 2 * k2, base + 2 * k2 + 1
            faces.append((b0, b1, t1)); faces.append((b0, t1, t0))
            faces.append((bot, b1, b0)); faces.append((top, t0, t1))

    def add_handle():
        """Half torus in the x-z plane attached at x = r."""
        base = len(verts)
        nu, nv = 10, 8
        for i in range(nu + 1):
            u = np.pi * (i / nu - 0.5)  # -90..90 deg arc
            cx = r + handle_r * np.cos(u) * 0.6
            cz = h / 2 + handle_r * np.sin(u)
            for j in range(nv):
                v = 2 * np.pi * j / nv
                verts.append((cx + tube_r * np.cos(v),
                              tube_r * np.sin(v),
                              cz + tube_r * 0.8 * np.sin(v + 1.0)))
        for i in range(nu):
            for j in range(nv):
                j2 = (j + 1) % nv
                a = base + i * nv + j
                b = base + i * nv + j2
                c = base + (i + 1) * nv + j2
                d = base + (i + 1) * nv + j
                faces.append((a, b, c)); faces.append((a, c, d))
        # cap the tube ends
        for i in (0, nu):
            ring = [base + i * nv + j for j in range(nv)]
            for j in range(1, nv - 1):
                if i == 0:
                    faces.append((ring[0], ring[j + 1], ring[j]))
                else:
                    faces.append((ring[0], ring[j], ring[j + 1]))

    add_cyl(0.0, 0.0)
    add_handle()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")
    return path


def main():
    import jax
    import jax.numpy as jnp

    from gaddpg_tpu.data.mesh_import import asset_from_mesh, extend_library, load_obj
    from gaddpg_tpu.data.mesh_native import native_available
    from gaddpg_tpu.envs import EnvParams, PandaGraspEnv
    from gaddpg_tpu.envs.assets import library_from_index

    obj_path = os.environ.get("OBJ", "output/meshes/mug.obj")
    if not os.path.exists(obj_path):
        make_mug_obj(obj_path)
        print(f"wrote {obj_path}")
    tris = load_obj(obj_path)
    print(f"mesh: {len(tris)} triangles, native={native_available()}")

    entry = asset_from_mesh(tris, mass=0.15, res=24)
    print(f"asset: {len(entry['spheres'])} spheres, "
          f"{0 if entry['grasps'] is None else len(entry['grasps'])} grasps, "
          f"mass {entry['mass']:.3f} kg, rest_h {entry['rest_height']:.3f}")
    assert entry["grasps"] is not None and len(entry["grasps"]) >= 8

    lib = library_from_index("ycb", "train")
    lib2 = extend_library(lib, [entry], ["mug_mesh"])
    mesh_idx = lib2.num_objects - 1
    env = PandaGraspEnv(EnvParams(), lib2)

    reset = jax.jit(lambda k: env.reset(k, obj_idx=mesh_idx))
    step = jax.jit(env.step)
    retract = jax.jit(env.retract)
    wins, valid = 0, 0
    for s in range(int(os.environ.get("SEEDS", 6))):
        state, obs = reset(jax.random.PRNGKey(s))
        if not bool(state.valid_scene):
            print(f"seed {s}: invalid scene")
            continue
        valid += 1
        for i in range(24):
            a = env.expert_action(state)
            state, obs, r, d, info = step(
                state, a, jax.random.fold_in(jax.random.PRNGKey(50 + s), i)
            )
            if bool(d):
                break
        state, rew = retract(state, jax.random.PRNGKey(100 + s))
        ok = float(rew) > 0.5 and float(state.phys.obj.pos[2]) < 1.0
        wins += ok
        print(f"seed {s}: lift={float(rew)} z={float(state.phys.obj.pos[2]):.3f}")
    print(f"mesh-object expert success: {wins}/{valid}")
    assert wins >= 1, "expert never lifted the mesh object"


if __name__ == "__main__":
    main()
