#!/usr/bin/env bash
# Larger-capacity run: h=512 x 4-layer MLP at the high-throughput batch.
cd "$(dirname "$0")/.."
python train.py train --steps "${1:-1500}" --episodes 256 --batch-size 2048 \
  --lr 1e-3 --critic-lr 1e-4 -H 512 --num-layers 4 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp \
  --print-freq 200 --eval-freq 250 --eval-games 256 \
  --checkpoint-dir checkpoints_big --log-dir logs_big --scan-cap 2048 \
  --checkpoint-freq 500
