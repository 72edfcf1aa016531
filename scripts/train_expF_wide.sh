#!/usr/bin/env bash
# Experiment F (round 3): WIDE from-scratch student distillation.
#
# expE (pure DAgger mix 0.0 + anchor-KL, BENCH.md) established that the
# failure is capacity, not distribution or teacher drift: the CE-optimal
# H=196 x 2 student of the 24.5k depth-2 searcher plays ~2k. This run
# attacks the remaining lever — a 3-layer H=384 student trained from
# SCRATCH (zero heads -> uniform start, nothing to protect, no anchor):
#   * --expert-mix 0.5: half the envs are expert-driven (deep states the
#     cold student can't reach on its own), half play the student's own
#     sampled policy (DAgger correction); every state gets expert labels.
#   * --expert-bf16: leaf evals in bfloat16 (~2x rollout throughput;
#     label flips confined to gap~0 ties the CE weight already zeroes).
#   * Teacher unchanged: frozen expA params + coefs (24.5k avg / 60%
#     pct_2048 at depth 2).
#
# Usage: scripts/train_expF_wide.sh [steps] [wallclock_timeout_s]
# --checkpoint-freq 25 banks progress; safe to kill + resume.
#
# --episodes 32, NOT 64: the depth-2 expert tree at 64 concurrent games
# (4*64*32*4*32 ~ 524k critic leaves per move) inside the fused while_loop
# crash-restarts the v5e TPU worker; 32 games (expD/expE's setting) runs
# fine with or without --expert-bf16 (probed round 4, both ways).
cd "$(dirname "$0")/.."
timeout "${2:-25200}" \
python train.py train --steps "${1:-600}" --episodes 32 --batch-size 4096 \
  --lr 1e-3 --critic-lr 1e-3 -H 384 --num-layers 3 --gamma 0.995 \
  --entropy 0.001 --dropout 0.0 \
  --points 0.10 --mono 1.0 --critic 1.0 --rtg-beta 0.9 \
  --warmup-steps 20 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --expert-iter --expert-depth 2 --expert-mix 0.5 --expert-bf16 \
  --expert-src checkpoints_expA --decouple-critic \
  --print-freq 100 --eval-freq 25 --eval-games 256 \
  --checkpoint-freq 25 \
  --checkpoint-dir checkpoints_expF --log-dir logs_expF --scan-cap 2560 \
  --resume
