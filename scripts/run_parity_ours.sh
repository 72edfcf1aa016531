#!/usr/bin/env bash
# Our trainer at the reference's README config (BASELINE.md), for curve-parity
# evidence vs scripts/run_reference.py runs. Usage: run_parity_ours.sh SEED [STEPS]
cd "$(dirname "$0")/.."
SEED="${1:-1}"
STEPS="${2:-2200}"
python train.py train --steps "$STEPS" --episodes 4 --batch-size 64 \
  --lr 1e-3 --critic-lr 1e-4 -H 196 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp --seed "$SEED" \
  --print-freq 1000 --eval-freq 100 --eval-games 100 \
  --checkpoint-dir "/tmp/parity_ours_s$SEED" --log-dir "/tmp/parity_ours_s$SEED/logs" \
  --scan-cap 2048
