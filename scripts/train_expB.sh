#!/usr/bin/env bash
# Round-2 experiment B: continue from expA's best (sampled eval 8,848,
# greedy 8,178, 2048-rate ~1%) toward the >=10% 2048-rate stretch goal.
# Diagnosis after expA: entropy settled at ~1.22 with beta at beta-min
# (the policy is genuinely uncertain, not under-annealed), and the value
# fit is weak (explained_var ~0.21) — which caps both advantage quality
# and the depth-2 expectimax eval (avg 9,989, the best eval so far, led
# 1-ply by a wide margin because critic leaves are noisy).
# Changes vs expA, deliberately few:
#   * gamma 0.995 -> 0.997 (effective horizon ~200 -> ~333 moves; expA's
#     0.99 -> 0.995 move was the single biggest win this round);
#   * critic 0.2 -> 0.4 and critic-lr 5e-4 (attack the value fit);
#   * lr 3e-4 continuation over a fresh cosine (warm-start pins step 4500,
#     trains to 24500 = 20k fresh steps).
# Prereq (already run):
#   python scripts/warmstart_from_best.py --ckpt-dir checkpoints_expB \
#     --src-dir checkpoints_expA --gamma 0.997 --highest-score 40520
cd "$(dirname "$0")/.."
python train.py train --steps "${1:-24500}" --episodes 512 --batch-size 4096 \
  --lr 3e-4 --critic-lr 5e-4 -H 196 --gamma 0.997 \
  --entropy 0.02 --adaptive-beta --target-entropy 0.25 \
  --beta-min 0.001 --beta-max 0.05 --beta-lr 0.005 \
  --points 0.10 --mono 1.0 --critic 0.4 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --print-freq 200 --eval-freq 100 --eval-games 256 --checkpoint-freq 100 \
  --checkpoint-dir checkpoints_expB --log-dir logs_expB --scan-cap 2048 --resume
