#!/usr/bin/env bash
# (reference: experiments/scripts/train_online.sh)
set -e
timestamp=$(date +%m%d_%H%M%S)
python -m gaddpg_tpu.cli.train_online \
  --config_file experiments/cfgs/td3_critic_aux_policy_aux.yaml \
  --policy DDPG --log_dir output/ddpg_${timestamp} "$@"
