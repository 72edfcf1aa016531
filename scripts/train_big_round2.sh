#!/usr/bin/env bash
# Round-2 big-model run: wider+deeper MLP from scratch at the high-throughput
# config (the h=196 reference size plateaus around eval ~5.5k; compute is no
# longer the constraint after the augmentation-sampler fix).
cd "$(dirname "$0")/.."
python train.py train --steps "${1:-20000}" --episodes 256 --batch-size 4096 \
  --lr 1e-3 --critic-lr 1e-4 -H 320 --num-layers 3 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --print-freq 200 --eval-freq 100 --eval-games 256 --checkpoint-freq 100 \
  --checkpoint-dir checkpoints_big --log-dir logs_big --scan-cap 2048 --resume
