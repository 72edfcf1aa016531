#!/usr/bin/env bash
cd "$(dirname "$0")/.."
python train.py train --steps 4500 --episodes 256 --batch-size 1024 \
  --lr 1e-3 --critic-lr 1e-4 -H 196 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp \
  --print-freq 200 --eval-freq 250 --eval-games 256 \
  --checkpoint-dir checkpoints_ht --log-dir logs_ht --scan-cap 2048 \
  --checkpoint-freq 500 --resume
