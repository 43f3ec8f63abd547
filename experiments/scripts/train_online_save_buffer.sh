#!/usr/bin/env bash
# expert data generation -> .npz buffer dump
set -e
python -m gaddpg_tpu.cli.train_online \
  --config_file experiments/cfgs/bc_save_data.yaml \
  --policy BC --save_buffer --log_dir output/save_data "$@"
