#!/usr/bin/env bash
# Round-2 experiment A, relaunch at h=196 (the committed best-model size; the
# h=320x3 expA checkpoints lived on a VM that was recycled mid-round — only
# committed artifacts survive). Same recipe as train_expA_round2.sh:
# warm-start from the plateaued best model, gamma 0.995 (double horizon),
# adaptive entropy anneal toward 0.25, critic-lr 3e-4, 512 episodes/step.
# Prereq: scripts/warmstart_from_best.py --ckpt-dir checkpoints_expA \
#           --src-dir checkpoints_ht --gamma 0.995
cd "$(dirname "$0")/.."
python train.py train --steps "${1:-20000}" --episodes 512 --batch-size 4096 \
  --lr 5e-4 --critic-lr 3e-4 -H 196 --gamma 0.995 \
  --entropy 0.02 --adaptive-beta --target-entropy 0.25 \
  --beta-min 0.001 --beta-max 0.05 --beta-lr 0.005 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --print-freq 200 --eval-freq 100 --eval-games 256 --checkpoint-freq 100 \
  --checkpoint-dir checkpoints_expA --log-dir logs_expA --scan-cap 2048 --resume
