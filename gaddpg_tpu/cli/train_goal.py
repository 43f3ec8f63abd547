"""Grasp-pose (goal feature) training CLI.

Trains the `GoalFeature` encoder to predict grasps + confidence from
object clouds, the analogue of the reference's grasp-evaluator/sampler
training data path (reference: misc/grasp_data_reader.py,
train_goal_feature config flag).

    python -m gaddpg_tpu.cli.train_goal --steps 200 --batch 32 \
        --index ycb --log_dir output/goal0
"""

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--index", default="ycb")
    p.add_argument("--log_dir", default="output/goal")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from gaddpg_tpu.data.grasp_dataset import (
        GraspDatasetGenerator,
        make_goal_feature_update,
    )
    from gaddpg_tpu.envs.assets import library_from_index
    from gaddpg_tpu.models import GoalFeature
    from gaddpg_tpu.train.metrics import MetricLogger

    lib = library_from_index(args.index, "train")
    gen = GraspDatasetGenerator(lib)
    goal = GoalFeature()
    key = jax.random.PRNGKey(args.seed)

    dummy = gen.sample(key, batch=args.batch)
    variables = goal.init(key, dummy["cloud"], train=False)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(args.lr, eps=1e-5, weight_decay=1e-5)
    opt_state = tx.init(params)
    update = make_goal_feature_update(goal, tx)

    logger = MetricLogger(args.log_dir)
    t0 = time.time()
    for i in range(args.steps):
        key, k1 = jax.random.split(key)
        batch = gen.sample(k1, batch=args.batch)
        params, stats, opt_state, m = update(params, stats, opt_state, batch)
        if i % 10 == 0:
            logger.log(i, {k: float(v) for k, v in m.items()})
            print(f"[{i}] pm={float(m['pm_loss']):.4f} "
                  f"bce={float(m['bce_loss']):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(args.log_dir, exist_ok=True)
    with open(os.path.join(args.log_dir, "goal_feature.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(
            {"params": jax.device_get(params), "batch_stats": jax.device_get(stats)}
        ))
    print("saved", os.path.join(args.log_dir, "goal_feature.msgpack"))


if __name__ == "__main__":
    main()
