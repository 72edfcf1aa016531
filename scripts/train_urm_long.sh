#!/usr/bin/env bash
# URM full-length run (round 5; VERDICT r4 item 2). The round-4 200-step
# cosine floored while the curve was still between plateau-onset and noise
# (peak 6,896 at step 160); this reruns the same working config — 4,096
# packed lanes x 128 horizon, the setup that did 1,088 -> 6,896 in one
# chip-hour — on a longer schedule, from scratch (fresh cosine; resuming the
# 200-step run would warm-start into a mis-matched schedule).
#
# Round-5 additions exercised in production: packed best-episode capture
# (--viz-dir; algo/capture.py) and on-policy EnvCarry resume (env_carry.npz
# alongside the train state).
#
# Usage: scripts/train_urm_long.sh [steps] [wallclock_timeout_s]
# --checkpoint-freq 10 banks progress; safe to kill + resume.
cd "$(dirname "$0")/.."
timeout "${2:-10800}" \
python train.py train --steps "${1:-450}" --packed --lanes 4096 --horizon 128 \
  --batch-size 8192 -t urm -H 64 --num-layers 2 --num-heads 4 --num-loops 4 \
  --truncated-loops 1 --lr 1e-3 --critic-lr 1e-4 --gamma 0.99 --entropy 0.02 \
  --dropout 0.0 --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 --no-kl-diagnostic \
  --print-freq 10 --eval-freq 20 --eval-games 128 --checkpoint-freq 10 \
  --checkpoint-dir checkpoints_urm_r5 --log-dir logs_urm \
  --viz-dir viz_data_urm --scan-cap 2560 --resume
