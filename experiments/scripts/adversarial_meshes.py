"""Adversarial non-convex OBJ meshes -> import -> verify -> expert eval.

Round-2 VERDICT item 8: the YCB/ShapeNet downloads are unreachable
(zero egress), so harden the real-mesh contact path with hand-authored
geometry that is genuinely non-convex -- interior lips, thin walls,
handles, holes, reflex corners -- the failure modes proxy primitives
and superquadrics never exercise (the reference loads such meshes via
env/panda_scene.py:523-573).

Five meshes:
  bowl_lip   -- bowl whose rim rolls inward (overhanging interior lip)
  pitcher    -- hollow tapered vessel + attached loop handle
  thin_cup   -- 3 mm-wall open cup (pinch must not crush through)
  l_bracket  -- L-shaped prism (reflex corner, flat plates)
  torus_ring -- solid torus (topological hole; grasp across the tube)

Each is written as a watertight OBJ, parsed back through
data/mesh_import.load_obj, converted by the native voxel/sphere-pack
pipeline (asset_from_mesh, which physics-verifies the antipodal grasp
candidates with the close-and-hold rig), appended to the library, and
graspped by the CHOMP expert over SEEDS episodes. Output: a per-mesh
success table (experiments/results/adversarial_meshes.md).

    python experiments/scripts/adversarial_meshes.py          # axon
    JAX_PLATFORMS=cpu SEEDS=2 python ...                      # smoke
Env knobs: SEEDS (10), OUT (output/adversarial), RES (28).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _platform  # noqa: E402,F401

OUT = os.environ.get("OUT", "output/adversarial")
SEEDS = int(os.environ.get("SEEDS", 10))
RES = int(os.environ.get("RES", 28))


# ---------------------------------------------------------------- mesh gen
def fix_orientation(verts, faces):
    """Flip winding if the closed surface's signed volume is negative
    (normals must point OUTWARD -- antipodal_grasps reads them)."""
    V = np.asarray(verts, np.float64)
    vol = sum(np.dot(V[a], np.cross(V[b], V[c])) for a, b, c in faces) / 6.0
    if vol < 0:
        faces = [(a, c, b) for a, b, c in faces]
    return verts, faces


def revolve(profile, nseg=28):
    """Revolve a CLOSED (r, z) polyline around +z -> watertight tris.

    Points with r == 0 become poles (single vertex); consecutive
    profile points are joined by quad strips / pole fans. The profile
    must be a closed loop (last point connects back to the first).
    """
    verts, rings = [], []
    for r, z in profile:
        if r <= 1e-9:
            rings.append((len(verts),))
            verts.append((0.0, 0.0, z))
        else:
            base = len(verts)
            for k in range(nseg):
                a = 2 * np.pi * k / nseg
                verts.append((r * np.cos(a), r * np.sin(a), z))
            rings.append(tuple(base + k for k in range(nseg)))
    faces = []
    n = len(rings)
    for i in range(n):
        ra, rb = rings[i], rings[(i + 1) % n]
        if len(ra) == 1 and len(rb) == 1:
            continue  # degenerate axis segment
        if len(ra) == 1:
            for k in range(nseg):
                faces.append((ra[0], rb[k], rb[(k + 1) % nseg]))
        elif len(rb) == 1:
            for k in range(nseg):
                faces.append((rb[0], ra[(k + 1) % nseg], ra[k]))
        else:
            for k in range(nseg):
                k2 = (k + 1) % nseg
                faces.append((ra[k], rb[k], rb[k2]))
                faces.append((ra[k], rb[k2], ra[k2]))
    return fix_orientation(verts, faces)


def extrude(poly, h):
    """Extrude a simple CCW polygon (x, y) to [0, h] in z; ear-clip caps."""
    n = len(poly)
    verts = [(x, y, 0.0) for x, y in poly] + [(x, y, h) for x, y in poly]
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces.append((i, j, n + j))
        faces.append((i, n + j, n + i))

    def ear_clip(ids):
        ids = list(ids)
        tris = []
        P = np.asarray(poly, np.float64)

        def cross(o, a, b):
            return (P[a][0] - P[o][0]) * (P[b][1] - P[o][1]) - \
                   (P[a][1] - P[o][1]) * (P[b][0] - P[o][0])

        def inside(p, a, b, c):
            d1 = cross(a, b, p); d2 = cross(b, c, p); d3 = cross(c, a, p)
            return (d1 >= -1e-12) and (d2 >= -1e-12) and (d3 >= -1e-12)

        guard = 0
        while len(ids) > 3 and guard < 10 * n:
            guard += 1
            m = len(ids)
            for k in range(m):
                a, b, c = ids[k - 1], ids[k], ids[(k + 1) % m]
                if cross(a, b, c) <= 1e-12:
                    continue  # reflex or collinear
                if any(inside(p, a, b, c) for p in ids
                       if p not in (a, b, c)):
                    continue
                tris.append((a, b, c))
                ids.pop(k)
                break
            else:
                break
        if len(ids) == 3:
            tris.append(tuple(ids))
        return tris

    for a, b, c in ear_clip(range(n)):
        faces.append((a, c, b))              # bottom cap, -z normal
        faces.append((n + a, n + b, n + c))  # top cap, +z normal
    return verts, faces


def tube(path_pts, radius, nv=8):
    """Closed tube along a 3D polyline (capped ends) for handles."""
    verts, faces = [], []
    frames = []
    for i in range(len(path_pts)):
        p = np.asarray(path_pts[i], np.float64)
        if i == 0:
            t = np.asarray(path_pts[1]) - p
        elif i == len(path_pts) - 1:
            t = p - np.asarray(path_pts[-2])
        else:
            t = np.asarray(path_pts[i + 1]) - np.asarray(path_pts[i - 1])
        t = t / max(np.linalg.norm(t), 1e-12)
        up = np.array([0.0, 1.0, 0.0])
        if abs(np.dot(up, t)) > 0.95:
            up = np.array([1.0, 0.0, 0.0])
        u = np.cross(up, t); u /= max(np.linalg.norm(u), 1e-12)
        w = np.cross(t, u)
        frames.append((p, u, w))
    for p, u, w in frames:
        for j in range(nv):
            a = 2 * np.pi * j / nv
            q = p + radius * (np.cos(a) * u + np.sin(a) * w)
            verts.append(tuple(q))
    for i in range(len(frames) - 1):
        for j in range(nv):
            j2 = (j + 1) % nv
            a = i * nv + j; b = i * nv + j2
            c = (i + 1) * nv + j2; d = (i + 1) * nv + j
            faces.append((a, b, c)); faces.append((a, c, d))
    first = list(range(nv))
    last = [(len(frames) - 1) * nv + j for j in range(nv)]
    for j in range(1, nv - 1):
        faces.append((first[0], first[j + 1], first[j]))
        faces.append((last[0], last[j], last[j + 1]))
    return fix_orientation(verts, faces)


def merge(*parts):
    verts, faces = [], []
    for v, f in parts:
        base = len(verts)
        verts.extend(v)
        faces.extend((a + base, b + base, c + base) for a, b, c in f)
    return verts, faces


def write_obj(path, verts, faces):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")
    return path


def make_bowl_lip():
    """Bowl whose rim rolls INWARD: an overhanging interior lip."""
    prof = [
        (0.000, 0.000),             # bottom center (outside)
        (0.030, 0.000), (0.046, 0.004), (0.053, 0.018),
        (0.055, 0.036),             # outer wall top
        (0.053, 0.044),
        (0.047, 0.047),             # rim crown
        (0.039, 0.045),             # lip overhang (rolls inward)
        (0.037, 0.040),             # lip underside -- overhang ends
        (0.041, 0.036),             # back out: interior wall bulge
        (0.040, 0.020),
        (0.030, 0.008), (0.012, 0.005),
        (0.000, 0.005),             # interior bottom center
    ]
    return revolve(prof)


def make_pitcher():
    """Hollow tapered vessel + loop handle (mug topology, pitcher form)."""
    prof = [
        (0.000, 0.000),
        (0.034, 0.000), (0.042, 0.006),
        (0.044, 0.030),             # belly
        (0.036, 0.070),             # taper in
        (0.032, 0.092),             # neck
        (0.034, 0.100),             # rim outer
        (0.030, 0.100),             # rim inner (3 mm lip)
        (0.028, 0.090),
        (0.032, 0.068),
        (0.039, 0.030),
        (0.036, 0.008), (0.015, 0.005),
        (0.000, 0.005),
    ]
    body = revolve(prof)
    # loop handle: arc in the x-z plane, ends buried in the wall
    ang = np.linspace(-0.55 * np.pi, 0.55 * np.pi, 9)
    path = [(0.036 + 0.030 * np.cos(a), 0.0, 0.052 + 0.032 * np.sin(a))
            for a in ang]
    return merge(body, tube(path, 0.0065))


def make_thin_cup():
    """Open cup with a 3 mm wall -- pinch grasps must not crush through."""
    prof = [
        (0.000, 0.000),
        (0.026, 0.000), (0.031, 0.003),
        (0.036, 0.075),             # outer wall (slight taper out)
        (0.033, 0.075),             # rim (3 mm)
        (0.029, 0.006),             # inner wall
        (0.010, 0.004),
        (0.000, 0.004),
    ]
    return revolve(prof)


def make_l_bracket():
    """L-shaped prism: reflex corner + flat plates (CCW polygon)."""
    poly = [
        (0.000, 0.000), (0.085, 0.000), (0.085, 0.024),
        (0.024, 0.024), (0.024, 0.072), (0.000, 0.072),
    ]
    return extrude(poly, 0.030)


def make_torus_ring():
    """Solid torus: R=42 mm ring, 13 mm tube; grasp across the tube."""
    R, r, m = 0.042, 0.013, 12
    prof = [(R + r * np.cos(a), r * np.sin(a))
            for a in (2 * np.pi * k / m for k in range(m))]
    return revolve(prof, nseg=24)


# (name, generator, mass, voxel-res override). thin_cup's 3 mm wall
# needs ~1.4 mm cells to register interior voxels at all; everything
# else is fine at the default RES (asset_from_mesh scales the packing
# min_radius down to the interior thickness for thin shells).
MESHES = [
    ("bowl_lip", make_bowl_lip, 0.14, None),
    ("pitcher", make_pitcher, 0.20, None),
    ("thin_cup", make_thin_cup, 0.08, 56),
    ("l_bracket", make_l_bracket, 0.25, None),
    ("torus_ring", make_torus_ring, 0.18, None),
]


def main():
    import jax

    from gaddpg_tpu.data.mesh_import import asset_from_mesh, extend_library, load_obj
    from gaddpg_tpu.data.mesh_native import native_available
    from gaddpg_tpu.envs import EnvParams, PandaGraspEnv
    from gaddpg_tpu.envs.assets import library_from_index

    os.makedirs(OUT, exist_ok=True)
    print(f"native mesh tools: {native_available()}", flush=True)

    entries, names, meta = [], [], []
    for name, gen, mass, res_over in MESHES:
        t0 = time.time()
        path = os.path.join(OUT, f"{name}.obj")
        verts, faces = gen()
        write_obj(path, verts, faces)
        tris = load_obj(path)
        entry = asset_from_mesh(tris, mass=mass, res=res_over or RES)
        ng = 0 if entry["grasps"] is None else len(entry["grasps"])
        print(f"{name}: {len(tris)} tris -> {len(entry['spheres'])} spheres, "
              f"{ng} verified grasps ({time.time()-t0:.0f}s)", flush=True)
        meta.append({"name": name, "tris": len(tris), "grasps": int(ng),
                     "res": res_over or RES})
        if ng == 0:
            # still REPORTED below: a zero-grasp mesh is the failure
            # mode this eval exists to surface, not a row to drop
            print(f"  !! {name}: no grasp survived verification", flush=True)
            continue
        entries.append(entry)
        names.append(name)

    lib = extend_library(library_from_index("ycb", "train"), entries, names)
    first = lib.num_objects - len(names)
    env = PandaGraspEnv(EnvParams(), lib)
    reset = jax.jit(env.reset, static_argnames=("obj_idx",))
    step = jax.jit(env.step)
    retract = jax.jit(env.retract)

    rows = []
    for mi, name in enumerate(names):
        oi = first + mi
        wins, valid, t0 = 0, 0, time.time()
        for s in range(SEEDS):
            state, obs = reset(jax.random.PRNGKey(1000 * mi + s), obj_idx=oi)
            if not bool(state.valid_scene):
                continue
            valid += 1
            for i in range(24):
                a = env.expert_action(state)
                state, obs, r, d, info = step(
                    state, a,
                    jax.random.fold_in(jax.random.PRNGKey(7000 + s), i))
                if bool(d):
                    break
            state, rew = retract(state, jax.random.PRNGKey(5000 + s))
            ok = float(rew) > 0.5 and float(state.phys.obj.pos[2]) < 1.0
            wins += int(ok)
        rate = wins / max(valid, 1)
        rows.append((name, wins, valid, rate, time.time() - t0))
        print(f"{name}: expert {wins}/{valid} = {rate:.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # the average covers only MEASURED rates: a 0/0 mesh (scene-validity
    # pipeline failure) or a zero-grasp mesh is reported as n/a, never
    # averaged in as 0.00 (advisor round-3 item 3)
    measured = [r for r in rows if r[2] > 0]
    avg = float(np.mean([r[3] for r in measured])) if measured else 0.0
    md = [
        "# Adversarial non-convex mesh eval",
        "",
        "Hand-authored watertight OBJ meshes with the contact features",
        "proxy primitives never exercise (interior lip, thin wall,",
        "handle loop, reflex corner, topological hole), pushed through",
        "the full external-asset path: load_obj -> native voxel-fill /",
        "sphere-pack -> antipodal candidates -> close-and-hold physics",
        "verification -> CHOMP expert rollouts",
        "(reference asset path: env/panda_scene.py:523-573).",
        "",
        f"Settings: res={RES} (per-mesh overrides in the table), "
        f"{SEEDS} seeds/mesh, device {jax.devices()[0].platform}.",
        "",
        "| mesh | tris | res | verified grasps | expert success | episodes |",
        "|---|---|---|---|---|---|",
    ]
    by_rate = {r[0]: r for r in rows}
    for m in meta:
        name = m["name"]
        if m["grasps"] == 0:
            md.append(f"| {name} | {m['tris']} | {m['res']} | 0 "
                      f"| n/a (no grasp survived verification) | - |")
        elif name in by_rate and by_rate[name][2] > 0:
            _, wins, valid, rate, _ = by_rate[name]
            md.append(f"| {name} | {m['tris']} | {m['res']} "
                      f"| {m['grasps']} | {rate:.2f} | {wins}/{valid} |")
        else:
            md.append(f"| {name} | {m['tris']} | {m['res']} "
                      f"| {m['grasps']} | n/a (0 valid episodes: scene "
                      f"validity failed) | 0/0 |")
    md += ["", f"**Average expert success over {len(measured)} measured "
           f"meshes: {avg:.3f}** "
           f"({len(meta) - len(measured)} reported n/a, excluded)", ""]
    res_path = os.path.join(os.path.dirname(__file__), "..", "results",
                            "adversarial_meshes.md")
    with open(res_path, "w") as f:
        f.write("\n".join(md))
    with open(os.path.join(OUT, "result.json"), "w") as f:
        json.dump({"rows": [list(r) for r in rows], "meta": meta,
                   "avg": avg, "n_measured": len(measured)}, f)
    print(f"average expert success: {avg:.3f} -> {res_path}", flush=True)


if __name__ == "__main__":
    main()
