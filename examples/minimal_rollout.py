"""Minimum end-to-end slice: expert grasps a box and lifts it.

Drives every layer through the public API: asset library -> env reset
(IK arm init) -> goal-servo expert -> physics -> point-cloud obs ->
retract -> lift reward. Run on CPU or TPU:

    JAX_PLATFORMS=cpu python examples/minimal_rollout.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

from gaddpg_tpu.envs import EnvParams, PandaGraspEnv, box_asset


def main():
    params = EnvParams()
    lib = box_asset(0.05, 0.05, 0.14, mass=0.2)
    env = PandaGraspEnv(params, lib)

    key = jax.random.PRNGKey(int(os.environ.get("SEED", 0)))
    t0 = time.time()
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    retract = jax.jit(env.retract)

    state, obs = reset(key)
    print(f"[reset] compile+run {time.time()-t0:.1f}s  valid_scene="
          f"{bool(state.valid_scene)} points={int(obs.num_points)}")
    print(f"[reset] hand z={float(obs.ef_pose[2,3]):.3f} obj z="
          f"{float(state.phys.obj.pos[2]):.3f} goal |t|="
          f"{float(jnp.linalg.norm(obs.goal_pose[4:7])):.3f}")

    t0 = time.time()
    for i in range(int(os.environ.get("STEPS", 20))):
        action = env.expert_action(state)
        state, obs, reward, done, info = step(state, action, jax.random.fold_in(key, i))
        print(
            f"[step {i:02d}] goal_dist={float(info['goal_dist']):.3f} "
            f"pts={int(info['point_num'])} collided={bool(info['collided'])} "
            f"done={bool(done)}"
        )
        if bool(done):
            break
    print(f"[rollout] {time.time()-t0:.1f}s")

    t0 = time.time()
    state, reward = retract(state, key)
    print(f"[retract] {time.time()-t0:.1f}s lift reward={float(reward)} "
          f"obj z={float(state.phys.obj.pos[2]):.3f} (init {float(state.init_obj_z):.3f})")
    return float(reward)


if __name__ == "__main__":
    r = main()
    sys.exit(0 if r is not None else 1)
