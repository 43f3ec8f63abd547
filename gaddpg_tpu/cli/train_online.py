"""Online training CLI.

Usage (mirrors reference: experiments/scripts/train_online.sh):

    python -m gaddpg_tpu.cli.train_online \
        --config_file experiments/cfgs/td3_critic_aux_policy_aux.yaml \
        --policy DDPG --log_dir output/run0 [--num_envs 1024]
"""

import argparse
import os
import time


def create_parser():
    p = argparse.ArgumentParser(description="GA-DDPG-TPU online training")
    p.add_argument("--policy", default="DDPG", choices=["DDPG", "BC"])
    p.add_argument("--config_file", default=None)
    p.add_argument("--log_dir", default="output/run")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--pretrained", default=None,
                   help="directory with an agent_latest.msgpack to resume")
    p.add_argument("--save_buffer", action="store_true")
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--index_file", default=None,
                   help="object library: ycb | extra_shape")
    return p


def main(argv=None):
    args = create_parser().parse_args(argv)
    overrides = {"output_dir": args.log_dir}
    for k in ("seed", "num_envs", "max_epoch", "index_file"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v

    from gaddpg_tpu.train.config import load_config
    from gaddpg_tpu.train.loop import Trainer
    from gaddpg_tpu.train.checkpoints import load_agent

    cfg = load_config(args.config_file, overrides=overrides, policy=args.policy)
    os.makedirs(cfg.output_dir, exist_ok=True)
    # snapshot the config (reference: core/train_online.py:108-126)
    import dataclasses, json
    with open(os.path.join(cfg.output_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    trainer = Trainer(cfg)
    if args.pretrained:
        restored = load_agent(trainer.agent_state, args.pretrained)
        if restored is not None:
            trainer.agent_state = restored
            print(f"resumed from {args.pretrained} at step {trainer.update_step}")

    t0 = time.time()
    perf = trainer.run(max_iters=args.max_iters)
    print(perf.table())
    print(f"total wall time {time.time()-t0:.0f}s, "
          f"update steps {trainer.update_step}, "
          f"env steps {int(trainer.buffer.total_env_step)}")

    if args.save_buffer:
        from gaddpg_tpu.replay import save_npz
        save_npz(trainer.buffer,
                 os.path.join(cfg.output_dir, cfg.save_data_name))


if __name__ == "__main__":
    main()
