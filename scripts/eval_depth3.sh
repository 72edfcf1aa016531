#!/usr/bin/env bash
# Depth-3 search evaluation (VERDICT r4 item 4): pruned depth-3 expectimax
# on the expA checkpoint, 128 games, plus the depth-2 reference row and a
# prune-bias check (scripts/prune_bias.py). Heavy: run on an otherwise idle
# chip. Usage: scripts/eval_depth3.sh [games] [ckpt]
set -e
cd "$(dirname "$0")/.."
GAMES="${1:-128}"
CKPT="${2:-checkpoints_expA}"
for cfg in "3 2" "3 3"; do
  set -- $cfg
  echo "=== depth=$1 prune=$2 ($GAMES games, $CKPT) ==="
  time python train.py evaluate "$CKPT" --games "$GAMES" --search \
    --search-depth "$1" --search-prune "$2" --env-seed 12345
done
echo "=== prune-bias check ==="
python scripts/prune_bias.py "$CKPT"
