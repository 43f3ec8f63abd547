"""Headline benchmark: env steps/sec/chip at 1024 parallel envs.

Runs the full environment step (IK -> 150 physics substeps -> point
render -> observation build) vmapped over NUM_ENVS on one chip, and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north star of
10,000 env steps/sec/chip (the reference's Ray farm tops out around
tens of env steps/sec total on a 4x V100 box, reference:
core/train_online.py:540-546 + experiments/config.py:147).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from gaddpg_tpu.envs import EnvParams, PandaGraspEnv
from gaddpg_tpu.envs.assets import library_from_index

NUM_ENVS = int(os.environ.get("BENCH_ENVS", 1024))
STEPS = int(os.environ.get("BENCH_STEPS", 10))
TARGET = 10000.0  # north-star env steps/sec/chip


def main():
    lib = library_from_index("ycb", "train")
    env = PandaGraspEnv(EnvParams(), lib)
    key = jax.random.PRNGKey(0)

    reset = jax.jit(jax.vmap(env.reset))
    step = jax.jit(env.step_batched)

    keys = jax.random.split(key, NUM_ENVS)
    states, obs = reset(keys)
    jax.block_until_ready(states.phys.obj.pos)

    actions = jnp.zeros((NUM_ENVS, 6)).at[:, 2].set(0.02)
    step_keys = jax.random.split(jax.random.fold_in(key, 1), NUM_ENVS)

    # warm-up / compile
    states, obs, r, d, info = step(states, actions, step_keys)
    jax.block_until_ready(obs.point_state)

    t0 = time.perf_counter()
    for i in range(STEPS):
        sk = jax.random.split(jax.random.fold_in(key, 2 + i), NUM_ENVS)
        states, obs, r, d, info = step(states, actions, sk)
    jax.block_until_ready(obs.point_state)
    dt = time.perf_counter() - t0

    steps_per_sec = NUM_ENVS * STEPS / dt
    print(json.dumps({
        "metric": f"env steps/sec/chip at {NUM_ENVS} parallel envs",
        "value": round(steps_per_sec, 1),
        "unit": "env steps/sec",
        "vs_baseline": round(steps_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
