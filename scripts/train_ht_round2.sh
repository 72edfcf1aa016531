#!/usr/bin/env bash
# Round-2 long run: resume the round-1 high-throughput checkpoint (step 4500,
# eval avg 5544) with an extended cosine schedule, 4x larger minibatches and
# the KL diagnostic off (the learner is the end-to-end governor, VERDICT #3).
cd "$(dirname "$0")/.."
python train.py train --steps "${1:-30000}" --episodes 256 --batch-size 4096 \
  --lr 1e-3 --critic-lr 1e-4 -H 196 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --print-freq 100 --eval-freq 100 --eval-games 256 --checkpoint-freq 100 \
  --checkpoint-dir checkpoints_ht --log-dir logs_ht --scan-cap 2048 --resume
