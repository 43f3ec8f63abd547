"""Component-level profile of the batched env step on the current chip.

Breaks the headline bench's step into its phases (IK/action, physics
with both contact-scan impls, render/observe, occluder sub-passes,
termination) and times each jitted in isolation at BENCH_ENVS envs, so
op-count creep between rounds is attributable (VERDICT round-3 weak
item 1: the driver bench regressed 10.7k -> 5.8k steps/s between
rounds 1 and 3 with no same-run attribution).

    JAX_PLATFORMS= python experiments/scripts/profile_step.py
Env knobs: BENCH_ENVS (1024), STEPS (5), PROFILE_DEVICE=axon|cpu.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

NUM_ENVS = int(os.environ.get("BENCH_ENVS", 1024))
STEPS = int(os.environ.get("STEPS", 5))


def timeit(name, fn, *args, reps=STEPS):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    from gaddpg_tpu.envs import EnvParams, PandaGraspEnv
    from gaddpg_tpu.envs.assets import library_from_index
    from gaddpg_tpu.physics.fast import fast_physics_step

    print(f"device: {jax.devices()[0].platform} x{jax.device_count()}, "
          f"{NUM_ENVS} envs, {STEPS} reps", flush=True)
    lib = library_from_index("ycb", "train")
    env = PandaGraspEnv(EnvParams(), lib)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, NUM_ENVS)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    jax.block_until_ready(states.phys.obj.pos)
    actions = jnp.zeros((NUM_ENVS, 6)).at[:, 2].set(0.02)
    sk = jax.random.split(jax.random.fold_in(key, 1), NUM_ENVS)

    full = jax.jit(env.step_batched)
    t_full = timeit("full step_batched", full, states, actions, sk)

    # --- phase splits ----------------------------------------------------
    apply_a = jax.jit(jax.vmap(env._apply_action))
    t_act = timeit("apply_action (IK)", apply_a, states, actions)

    def phys_impl(impl):
        def f(st):
            return fast_physics_step(
                env.p.physics, st.phys, lib.spheres[st.obj_idx],
                lib.mass[st.obj_idx], lib.inertia[st.obj_idx],
                scan_impl=impl,
            )
        return jax.jit(f)

    t_phys_x = timeit("physics (xla scan)", phys_impl("xla"), states)
    try:
        t_phys_p = timeit("physics (pallas scan)", phys_impl("pallas"), states)
    except Exception as e:
        print(f"pallas scan failed: {type(e).__name__}", flush=True)
        t_phys_p = float("nan")

    obs_fn = jax.jit(jax.vmap(env._observe))
    sk2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(sk)
    t_obs = timeit("observe (render+points+image)", obs_fn, states, sk2)

    # occluder sub-passes: full vs without the arm-sphere pass
    def occ_full(st):
        hand = env._hand(st)
        return env._occluder_depth(st, hand, env._camera_pose_inv(hand))
    t_occf = timeit("occluder_depth (full)", jax.jit(jax.vmap(occ_full)),
                    states)

    from gaddpg_tpu.physics.step import gripper_box_poses
    from gaddpg_tpu.render.camera import box_zdepth, plane_zdepth

    def occ_noarm(st):
        hand = env._hand(st)
        cam = env._camera_pose_inv(hand)
        p = env.p
        occ = plane_zdepth(p.camera, cam, p.physics.table_z)
        boxes = gripper_box_poses(hand, st.phys.arm.q[7], st.phys.arm.q[8],
                                  p.physics)
        for pose, he in zip(boxes, (p.physics.finger_half_extents,
                                    p.physics.finger_half_extents,
                                    p.physics.palm_half_extents)):
            occ = jnp.minimum(occ, box_zdepth(p.camera, cam, pose, he))
        return occ
    t_occn = timeit("occluder_depth (no arm spheres)",
                    jax.jit(jax.vmap(occ_noarm)), states)

    def goal_term(st):
        st2 = env._update_goal(st)
        return st2.goal_pose
    t_goal = timeit("update_goal", jax.jit(jax.vmap(goal_term)), states)

    acc = t_act + t_phys_x + t_obs + t_goal
    print(f"\nsum of phases (xla physics): {acc * 1e3:.1f} ms "
          f"vs full {t_full * 1e3:.1f} ms", flush=True)
    print(f"steps/s @{NUM_ENVS}: full={NUM_ENVS / t_full:.0f}", flush=True)
    if np.isfinite(t_phys_p):
        faster = "pallas" if t_phys_p < t_phys_x else "xla"
        print(f"contact scan A/B: xla {t_phys_x * 1e3:.1f} ms, "
              f"pallas {t_phys_p * 1e3:.1f} ms -> {faster}", flush=True)


if __name__ == "__main__":
    main()
