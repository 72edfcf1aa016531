#!/usr/bin/env bash
# Depth-3 search evaluation (round 5; VERDICT r4 item 4): pruned depth-3
# expectimax on the flagship checkpoint at n>=64 games — the round-4
# headline rested on n=16 (±8pp binomial band on the 2048-rate). bf16
# critic leaves (--search-bf16) cut the measured 578 ms/move roughly in
# half; prune 2 is the recommended default (bias table in BENCH.md).
# Heavy: run on an otherwise idle chip.
# Usage: scripts/eval_depth3.sh [games] [ckpt] [extra flags...]
set -e
cd "$(dirname "$0")/.."
GAMES="${1:-64}"
CKPT="${2:-checkpoints_expA}"
shift 2 2>/dev/null || true
echo "=== depth=3 prune=2 bf16 ($GAMES games, $CKPT) ==="
time python train.py evaluate "$CKPT" --games "$GAMES" --search \
  --search-depth 3 --search-prune 2 --search-bf16 --env-seed 12345 "$@"
