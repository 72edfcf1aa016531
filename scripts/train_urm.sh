#!/usr/bin/env bash
# URM family training (the reference ships this model but disables its
# training path; here it trains).
cd "$(dirname "$0")/.."
python train.py train --steps "${1:-600}" --episodes 128 --batch-size 512 \
  -t urm --hidden 64 --num-layers 2 --num-heads 4 --num-loops 4 \
  --truncated-loops 1 --lr 1e-3 --critic-lr 1e-4 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 \
  --print-freq 100 --eval-freq 200 --eval-games 128 \
  --checkpoint-dir checkpoints_urm --log-dir logs_urm --scan-cap 2048
