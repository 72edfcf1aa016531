#!/usr/bin/env bash
# Round-2 experiment C: EXPERT ITERATION from expA's best model.
# The corrected depth-2 expectimax (algo/search.py) turns the expA
# checkpoint into a 24.5k-average / 60%-2048 player (BENCH.md) — 2.8x the
# policy it wraps. This run distills that expert back into the network:
# rollouts take depth-2 search actions (~43 s for 32 games, ~41k samples),
# the policy trains cross-entropy on them, the critic regresses the
# expert trajectories' returns. Better critic => better expert => better
# targets — the AlphaZero-style cycle, feasible only because the batched
# TPU engine makes the ~16k-leaf-per-move expert cheap.
# Config notes:
#   * expert-mix 0.5 (DAgger): the first launch of this experiment used pure
#     expert states (mix 1.0) and the policy's SOLO eval collapsed 8,848 ->
#     1,392 within 40 steps — the imitator was never labeled on states it
#     reaches by itself, and the degrading critic dragged the expert down
#     with it (24.9k -> 15.2k). Half the envs now play the sampled policy,
#     and every visited state gets the expert's label;
#   * sharp targets + decoupled critic (attempt 3): attempt 2 (soft-CE
#     targets at tau 0.02, gap-weighted, mix 0.5, shared trunk) collapsed
#     solo play within 24 steps — sampled eval 8,848 -> 1,253, greedy
#     7,350 -> 3,542 (measured offline on the step-125 train_state). Two
#     legs: the soft target's own entropy is high (and grows as the live
#     sigma widens under mixed expert/policy returns), so the faithful
#     imitator samples badly; and critic-weight-1.0 gradients through the
#     SHARED trunk scrambled the policy head (greedy leg). Now the CE pulls
#     one-hot(argmax) gated by the soft gap (--expert-sharp, default), and
#     --decouple-critic keeps value gradients out of the trunk;
#   * critic 1.0: the value fit is the engine of the cycle (CE is easy);
#     safe at 1.0 now that the critic head is trunk-decoupled;
#   * fixed small entropy bonus (imitating a deterministic expert should
#     sharpen the policy; no adaptive annealing needed);
#   * rtg-beta 0.9: moments must re-calibrate fast, returns jump ~3x —
#     and the warm start measures them under expert play to begin with;
#   * scan-cap 2560: expert games run ~1,300-2,560 moves.
# Prereq (already run):
#   python scripts/warmstart_from_best.py --ckpt-dir checkpoints_ei \
#     --src-dir checkpoints_expA --gamma 0.995 --train-step 100 \
#     --highest-score 40520 --expert-depth 2
cd "$(dirname "$0")/.."
# lr 5e-5 (attempt 4): at 5e-4 the sharp CE tore the policy apart by
# catastrophic interference within 8 steps (batch avg 17k -> 5.9k) — the
# collapsing policy degrades the DAgger state mix, the shifting moments
# degrade the expert, and the cycle implodes. Distillation on a 196-wide
# trunk needs slow drift.
python train.py train --steps "${1:-700}" --episodes 32 --batch-size 4096 \
  --lr 5e-5 --critic-lr 8e-4 -H 196 --gamma 0.995 \
  --entropy 0.001 \
  --points 0.10 --mono 1.0 --critic 1.0 --rtg-beta 0.9 \
  --warmup-steps 5 --upsample-ratio 0.25 -t mlp --no-kl-diagnostic \
  --expert-iter --expert-depth 2 --expert-mix 0.5 --decouple-critic \
  --print-freq 100 --eval-freq 25 --eval-games 256 --checkpoint-freq 25 \
  --checkpoint-dir checkpoints_ei --log-dir logs_ei --scan-cap 2560 --resume
