#!/usr/bin/env bash
# URM training at scale (VERDICT r4 item 5): the reference ships GameURM but
# hard-disables its training path (reference train.py:1528-1532); here it
# trains, in packed (auto-reset) mode at 4,096 persistent lanes — the URM's
# recurrent loops put ~60x the MLP's matmul FLOPs per board, so this is the
# config where the MXU actually matters (bench.py:bench_rollout_urm measures
# the 16k-lane rollout; training uses 4k lanes to keep the learner's
# 512k-samples-per-step update budget inside a sane wall-clock per step).
#
# Usage: scripts/train_urm_packed.sh [steps] [wallclock_timeout_s]
# --checkpoint-freq 10 banks progress; safe to kill + resume.
cd "$(dirname "$0")/.."
timeout "${2:-3600}" \
python train.py train --steps "${1:-200}" --packed --lanes 4096 --horizon 128 \
  --batch-size 8192 -t urm -H 64 --num-layers 2 --num-heads 4 --num-loops 4 \
  --truncated-loops 1 --lr 1e-3 --critic-lr 1e-4 --gamma 0.99 --entropy 0.02 \
  --dropout 0.0 --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 --no-kl-diagnostic \
  --print-freq 10 --eval-freq 20 --eval-games 128 --checkpoint-freq 10 \
  --checkpoint-dir checkpoints_urm --log-dir logs_urm --resume
