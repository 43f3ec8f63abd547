#!/bin/bash
# Chain the three same-budget RL-ablation arms sequentially (one device),
# then print the report table. See rl_ablation.py for the design.
set -u
cd "$(dirname "$0")/../.."
U=${UPDATES:-600}
for arm in noq td3 pretrain; do
  echo "=== ARM $arm ($(date +%T)) ==="
  ARM=$arm UPDATES=$U python experiments/scripts/rl_ablation.py \
    || echo "ARM $arm FAILED rc=$?"
done
echo "=== REPORT ==="
ARM=report python experiments/scripts/rl_ablation.py
