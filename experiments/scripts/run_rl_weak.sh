#!/bin/bash
# Weak-expert / low-demo-budget RL-ablation sweep (round-3 verdict
# item 6): the round-4 -Q mechanism study only tested regimes where
# BC+DAgger already matches the expert; the reference's premise is RL
# escaping a WEAKER BC baseline (reference: core/ddpg.py:164-177,
# experiments/cfgs/td3_critic_aux_policy_aux.yaml). This sweep reruns
# the same three same-budget arms (rl_ablation.py) at shrinking demo
# budgets -- episode-aligned truncation of one fixed YCB expert buffer
# -- so BC plateaus below expert and the -Q term gets its best shot.
#
#   DATA=output/ycb_demos_r4 bash experiments/scripts/run_rl_weak.sh
#
# Collects the YCB buffer + fixed scenes first if DATA is missing
# (train_bc_long.py collection phase only). One device; arms chain
# sequentially. Results under output/rl_weak_f<frac>/<arm>/result.json.
set -u
cd "$(dirname "$0")/../.."
DATA=${DATA:-output/ycb_demos_r4}
U=${UPDATES:-800}
FRACTIONS=${FRACTIONS:-"1.0 0.25 0.1"}

if [ ! -f "$DATA/bc_demos.npz" ]; then
  echo "=== collecting YCB expert buffer -> $DATA ($(date +%T)) ==="
  OUT=$DATA INDEX=ycb CLUTTER=0 ENVS=24 TARGET_TRANSITIONS=${TRANSITIONS:-20000} \
    MAX_UPDATES=0 DAGGER_WAVES=0 SAVE_EVERY=10 MAX_HOURS=3.0 \
    python experiments/scripts/train_bc_long.py || exit 1
fi

for f in $FRACTIONS; do
  for arm in noq td3 pretrain; do
    out=output/rl_weak_f${f}
    if [ -f "$out/$arm/result.json" ]; then
      echo "=== skip $arm @ fraction $f (done) ==="
      continue
    fi
    echo "=== ARM $arm @ fraction $f ($(date +%T)) ==="
    DATA=$DATA OUT=$out FRACTION=$f ARM=$arm UPDATES=$U \
      python experiments/scripts/rl_ablation.py \
      || echo "ARM $arm@$f FAILED rc=$?"
  done
done

echo "=== REPORT ==="
for f in $FRACTIONS; do
  echo "--- fraction $f"
  OUT=output/rl_weak_f${f} ARM=report python experiments/scripts/rl_ablation.py
done
