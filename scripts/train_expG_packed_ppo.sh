#!/usr/bin/env bash
# Experiment G (round 5): the VERDICT-named fallback after expF's
# distillation plateau — plain large-batch PPO at H=384 x 3, from scratch,
# in PACKED mode, with the levers that produced expA's 8,848 (gamma 0.995
# double horizon, adaptive entropy anneal toward a DECISIVE 0.25-nat
# policy, critic 0.2, cosine over the full run).
#
# Why the pivot (decision evidence, step-200 expF probe):
#   * expF imitation CE flat at ~0.44 for 80 steps, entropy stuck at 0.85
#     nats -> the student stopped fitting and stayed SOFT;
#   * sampled eval 2,063 vs greedy 4,594 — the 2.2x decisiveness gap is the
#     distillation failure mode (calibrated-soft policies lose sampled
#     games), consistent with expC/D/E's settled diagnosis (BENCH.md);
#   * expA's sampled 8,848 required entropy annealed to ~0.25. PPO with the
#     anneal trains decisiveness directly; distillation does not.
#
# Packed at 512 lanes x 256 horizon = 131k env-steps/step (~2.6B env steps
# over 20k steps — expA's scale) with round-5 best-episode capture +
# on-policy carry resume exercised in production.
#
# Usage: scripts/train_expG_packed_ppo.sh [steps] [wallclock_timeout_s]
cd "$(dirname "$0")/.."
timeout "${2:-10800}" \
python train.py train --steps "${1:-20000}" --packed --lanes 512 --horizon 256 \
  --batch-size 4096 --lr 1e-3 --critic-lr 1e-4 -H 384 --num-layers 3 \
  --gamma 0.995 --dropout 0.0 \
  --entropy 0.02 --adaptive-beta --target-entropy 0.25 \
  --beta-min 0.001 --beta-max 0.05 --beta-lr 0.005 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 20 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --print-freq 250 --eval-freq 250 --eval-games 128 \
  --checkpoint-freq 250 \
  --checkpoint-dir checkpoints_expG --log-dir logs_expG \
  --viz-dir viz_data_expG --scan-cap 2560 --resume
