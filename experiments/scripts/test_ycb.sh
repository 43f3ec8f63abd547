#!/usr/bin/env bash
# eval protocol: ~200 episodes x 3 runs (reference: experiments/scripts/test_ycb.sh)
set -e
python -m gaddpg_tpu.cli.train_test_offline --test \
  --pretrained "${1:?usage: test_ycb.sh <model_dir>}" \
  --index_file ycb --num_runs 3 --episodes 200 "${@:2}"
