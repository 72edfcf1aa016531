#!/usr/bin/env bash
# Round-2 experiment A: break the ~5.5k sampled-eval plateau that both h=196
# (round 1, 30k steps) and h=320x3 (this round, plateaued by step ~4200) hit.
# Diagnosis: greedy eval of the plateaued policy scores 7.2k avg / 18k max —
# the policy is both too stochastic (entropy ~0.62 at fixed beta 0.02) and
# too short-sighted (gamma 0.99 ~ 100-move horizon vs ~1000-move games) with
# a weak value fit (explained_var ~0.2 at critic-lr 1e-4).
# Changes vs train_big_round2.sh, all within the reference flag surface:
#   * warm-start from the plateaued best model (scripts/warmstart_from_best.py
#     --gamma 0.995 re-measures RTG moments under the new horizon);
#   * gamma 0.995 (double the effective horizon);
#   * adaptive entropy annealing toward target 0.25 (reference L10 mechanism);
#   * critic-lr 3e-4; lr 5e-4 continuation; 512 episodes/step for gradient
#     quality (compute is free: ~0.5s/step at this config).
cd "$(dirname "$0")/.."
python train.py train --steps "${1:-20000}" --episodes 512 --batch-size 4096 \
  --lr 5e-4 --critic-lr 3e-4 -H 320 --num-layers 3 --gamma 0.995 \
  --entropy 0.02 --adaptive-beta --target-entropy 0.25 \
  --beta-min 0.001 --beta-max 0.05 --beta-lr 0.005 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --print-freq 200 --eval-freq 100 --eval-games 256 --checkpoint-freq 100 \
  --checkpoint-dir checkpoints_expA --log-dir logs_expA --scan-cap 2048 --resume
