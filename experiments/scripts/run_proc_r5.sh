#!/bin/bash
# Round-5 proc-mesh flagship retrain (VERDICT round-4 item 2): make the
# collision-aux head actually trainable by KEEPING collision-positive
# expert episodes in the demo buffer (COL_FILTER=0) and down-weighting
# their BC imitation instead (COL_DISCOUNT), so collide_future carries
# positives and the aux BCE trains the shared encoder on real collision
# geometry -- the round-4b clutter recipe applied at mesh scale.
#
#   bash experiments/scripts/run_proc_r5.sh            # axon device
#
# Phases: collect 30k demos on the 1216-object train split -> 5k BC
# updates with snapshots every 500 -> snapshot curve on the test split
# (eval_snaps.py) -> pick the curve peak for the 3-seed flagship eval.
set -u
cd "$(dirname "$0")/../.."
OUT=${OUT:-output/bc_proc_r5}
# fused train SA is default-on for TPU backends but measured 1.47x
# slower on THIS emulator-class device (per-grid-step dispatch; see
# BENCH sa_train_ab_ms_b64) -- pin today's long runs to the faster XLA
# path; numerics are equivalent (round-5 gather-precision fix)
export GADDPG_PALLAS_SA_TRAIN=${GADDPG_PALLAS_SA_TRAIN:-0}

OUT=$OUT INDEX=proc_shapenet_1216 SPLIT=train CLUTTER=0 \
  ENVS=${ENVS:-48} TARGET_TRANSITIONS=${TRANSITIONS:-30000} \
  MAX_UPDATES=${UPDATES:-5000} SNAP_EVERY=500 DAGGER_WAVES=0 \
  COL_FILTER=0 COL_DISCOUNT=0.5 COL_AUX=0.5 SUCCESS_FILTER=0 \
  VERIFY_GRASPS=0 SAVE_EVERY=20 MAX_HOURS=${MAX_HOURS:-4.0} \
  python experiments/scripts/train_bc_long.py || exit 1

echo "=== snapshot curve on the test split ($(date +%T)) ==="
CKPT=$OUT INDEX=proc_shapenet_1216 SPLIT=test WAVES=${CURVE_WAVES:-3} \
  ENVS=24 COL_AUX=0.5 python experiments/scripts/eval_snaps.py || exit 1
