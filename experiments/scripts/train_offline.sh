#!/usr/bin/env bash
set -e
python -m gaddpg_tpu.cli.train_test_offline \
  --config_file experiments/cfgs/bc_aux_dagger.yaml \
  --policy BC --buffer "${1:-data/offline_data/data_50k.npz}" \
  --log_dir output/bc_offline "${@:2}"
