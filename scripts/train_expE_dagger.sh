#!/usr/bin/env bash
# Experiment E (round 3): pure-DAgger distillation of the frozen depth-2
# expectimax searcher, with an anchor-KL trust region.
#
# What changed vs expD (which collapsed solo eval 8,848 -> ~1,300 in 24
# steps, BENCH.md "Distilling the searcher"):
#   * --expert-mix 0.0 — the STUDENT drives every env; the frozen expert
#     only supplies labels. expD at mix 0.5 drew ~97% of sample mass from
#     deep expert states (expert games run ~1,300 moves vs student ~450)
#     that the 196-wide student can't represent, and unconstrained CE
#     traded away the early game to fit them. At mix 0.0 the training
#     distribution IS the student's own play — the classic DAgger setup.
#   * --anchor-kl 0.5 — KL(warm-start || student) per sample keeps
#     probability mass wherever the 8,848-avg warm-start policy had it
#     (algo/update.py), bounding how much competence CE can trade away.
#   * Student critic keeps training (decoupled) so the distilled net
#     remains searchable afterwards.
#
# Prereq (fresh student state; moments measured under STUDENT play, since
# mix 0.0 trains the critic on the student's own returns):
#   python scripts/warmstart_from_best.py --ckpt-dir checkpoints_expE \
#     --src-dir checkpoints_expA --gamma 0.995 --train-step 100 \
#     --highest-score 40520
#
# Usage: scripts/train_expE_dagger.sh [steps] [wallclock_timeout_s]
# --checkpoint-freq 25 banks progress; a timeout kill loses <= 25 steps.
cd "$(dirname "$0")/.."
timeout "${2:-3300}" \
python train.py train --steps "${1:-700}" --episodes 32 --batch-size 4096 \
  --lr 2e-4 --critic-lr 8e-4 -H 196 --gamma 0.995 \
  --entropy 0.001 \
  --points 0.10 --mono 1.0 --critic 1.0 --rtg-beta 0.9 \
  --warmup-steps 5 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --expert-iter --expert-depth 2 --expert-mix 0.0 --anchor-kl 0.5 \
  --expert-src checkpoints_expA --decouple-critic \
  --print-freq 100 --eval-freq 25 --eval-games 256 \
  --checkpoint-freq 25 \
  --checkpoint-dir checkpoints_expE --log-dir logs_expE --scan-cap 2560 \
  --resume
