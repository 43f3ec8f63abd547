#!/bin/bash
# Image-mode (RGBDM/ResNet18) policy -> task-success numbers.
#
# Round-2 VERDICT item 4: train the image policy with domain
# randomization on, BOTH from-scratch and pretrained-ResNet init, and
# evaluate each on the fixed-scene protocol (the reference's image
# pipeline: core/networks.py:106-147,
# experiments/model_spec/rl_resnet_model_spec.yaml).
#
# Zero-egress pretraining substitute (see export_resnet.py): pretrain
# the encoder on the extra_shape primitive library in sim, export to a
# torchvision-layout .npz, and ingest it through the same
# AgentConfig.pretrained_resnet path a real ImageNet checkpoint takes.
#
# Stages (each resumable; rerunning skips completed stages):
#   1. pretrain image BC on extra_shape            -> output/bc_image_pre
#   2. export its policy encoder                   -> output/resnet18_sim.npz
#   3. from-scratch image BC+DAgger on YCB         -> output/bc_image_scratch
#   4. pretrained-init arm (shares stage-3 demos)  -> output/bc_image_pretrained
#   5. fixed-scene eval of both arms + expert      -> output/image_eval.log
#
# Run on the device (axon): bash experiments/scripts/image_policy_pipeline.sh
set -e
cd "$(dirname "$0")/../.."

IMG=${IMG:-64}
COMMON="USE_IMAGE=1 IMG=$IMG DOMAIN_RAND=1 BATCH=64 SAVE_EVERY=50"

# ---- stage 1: sim pretrain on the primitive library -----------------
if [ ! -f output/bc_image_pre/train_stats.json ]; then
  env $COMMON OUT=output/bc_image_pre INDEX=extra_shape NUM_SCENES=50 \
    TARGET_TRANSITIONS=6000 MAX_UPDATES=2000 DAGGER_WAVES=0 \
    MAX_HOURS=${PRE_HOURS:-1.0} \
    python experiments/scripts/train_bc_long.py
fi

# ---- stage 2: export encoder (torchvision-layout npz) ----------------
if [ ! -f output/resnet18_sim.npz ]; then
  CKPT=output/bc_image_pre OUT=output/resnet18_sim.npz IMG=$IMG \
    python experiments/scripts/export_resnet.py
fi

# ---- stage 3: from-scratch arm on YCB --------------------------------
if [ ! -f output/bc_image_scratch/train_stats.json ]; then
  env $COMMON OUT=output/bc_image_scratch INDEX=ycb \
    TARGET_TRANSITIONS=15000 MAX_UPDATES=5000 \
    DAGGER_WAVES=20 DAGGER_UPDATES_PER_WAVE=40 \
    MAX_HOURS=${ARM_HOURS:-1.5} \
    python experiments/scripts/train_bc_long.py
fi

# ---- stage 4: pretrained-init arm (same demos + scenes) ---------------
if [ ! -f output/bc_image_pretrained/train_stats.json ]; then
  mkdir -p output/bc_image_pretrained
  cp -n output/bc_image_scratch/bc_demos.npz \
        output/bc_image_scratch/eval_scenes.npz \
        output/bc_image_pretrained/ 2>/dev/null || true
  env $COMMON OUT=output/bc_image_pretrained INDEX=ycb \
    PRETRAINED=output/resnet18_sim.npz \
    TARGET_TRANSITIONS=15000 MAX_UPDATES=5000 \
    DAGGER_WAVES=20 DAGGER_UPDATES_PER_WAVE=40 \
    MAX_HOURS=${ARM_HOURS:-1.5} \
    python experiments/scripts/train_bc_long.py
fi

# ---- stage 5: fixed-scene protocol evals ------------------------------
SCENES=output/bc_image_scratch/eval_scenes.npz
{
  echo "=== image-mode fixed-scene evals (IMG=$IMG, DR on) ==="
  EXPERT=1 CKPT=output/bc_image_scratch SCENES=$SCENES RUNS=3 \
    USE_IMAGE=1 IMG=$IMG python experiments/scripts/eval_ckpt_fixed.py
  CKPT=output/bc_image_pretrained SCENES=$SCENES RUNS=3 \
    USE_IMAGE=1 IMG=$IMG python experiments/scripts/eval_ckpt_fixed.py
} 2>&1 | tee output/image_eval.log
