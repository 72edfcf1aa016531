#!/usr/bin/env bash
# Experiment D: FROZEN-teacher expert iteration (policy distillation).
#
# Why frozen: expC ran the depth-2 expectimax teacher on the LEARNER'S live
# critic + RTG moments. Four lr settings (5e-4 .. 5e-5) all imploded the
# same way — the student drifts, its critic/moments miscalibrate, the
# teacher's leaf values degrade, and imitating the degraded labels
# accelerates the drift (eval avg 8848 -> ~1300 and flat). With
# --expert-src the teacher is the FIXED expA-best checkpoint (params from
# best_model, denormalization coefs from its train_state moments) — the
# exact searcher measured at 24.5k avg / 60% pct_2048 (BENCH.md). The
# objective becomes plain DAgger against a stationary expert: supervised,
# stable. Student still trains its own critic (decoupled) on the mixed
# rollouts so the distilled net remains searchable afterwards.
#
# Prereq (fresh student state, moments measured under expert play):
#   python scripts/warmstart_from_best.py --ckpt-dir checkpoints_expD \
#     --src-dir checkpoints_expA --gamma 0.995 --train-step 100 \
#     --highest-score 40520 --expert-depth 2
#
# Usage: scripts/train_expD_frozen.sh [steps] [wallclock_timeout_s]
# The timeout guards the round-end bench: checkpoint-freq 25 banks
# progress, so a timeout kill loses at most ~25 steps.
cd "$(dirname "$0")/.."
timeout "${2:-3300}" \
python train.py train --steps "${1:-700}" --episodes 32 --batch-size 4096 \
  --lr 2e-4 --critic-lr 8e-4 -H 196 --gamma 0.995 \
  --entropy 0.001 \
  --points 0.10 --mono 1.0 --critic 1.0 --rtg-beta 0.9 \
  --warmup-steps 5 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --expert-iter --expert-depth 2 --expert-mix 0.5 \
  --expert-src checkpoints_expA --decouple-critic \
  --print-freq 100 --eval-freq 25 --eval-games 256 \
  --checkpoint-freq 25 \
  --checkpoint-dir checkpoints_expD --log-dir logs_expD --scan-cap 2560 \
  --resume
