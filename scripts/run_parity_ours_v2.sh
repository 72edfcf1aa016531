#!/usr/bin/env bash
# Our trainer at the reference's EXACT README config for curve parity.
#
# Round-2's parity runs (run_parity_ours.sh) deviated from the README config
# on two axes the reference defaults silently set: the reference plays ONE
# game per train step (--episodes defaults to 1, reference train.py:1298)
# and uses minibatch 4 (--batch-size 4 IS the minibatch size, train.py:1299)
# — while ours ran 4 episodes/step with minibatch 64. That means 4x more
# data per update and 16x fewer (16x less noisy) optimizer steps per sample,
# a plausible mechanism for the round-2 breakout asymmetry (ours 2/2 broke
# out by step 300; reference 0/3 by step 2,500-4,200). This script removes
# the mismatch: episodes=1, minibatch=4, everything else per README.md:12.
#
# Usage: run_parity_ours_v2.sh SEED [STEPS]
cd "$(dirname "$0")/.."
SEED="${1:-1}"
STEPS="${2:-2500}"
python train.py train --steps "$STEPS" --episodes 1 --batch-size 4 \
  --lr 1e-3 --critic-lr 1e-4 -H 196 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp --seed "$SEED" \
  --print-freq 1000 --eval-freq 100 --eval-games 100 --eval-fixed-stream \
  --checkpoint-dir "/tmp/parity2_ours_s$SEED" \
  --log-dir "/tmp/parity2_ours_s$SEED/logs" \
  --scan-cap 2048
