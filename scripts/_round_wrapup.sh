#!/usr/bin/env bash
# Round wrap-up hygiene: make sure every driver artifact and measurement
# that exists on disk is committed, so the audit trail (BENCH_r*.json,
# MULTICHIP_r*.json, BENCH_CLEAN.json, logs) stays in-repo across rounds.
# VERDICT r4 item 9: previous rounds left BENCH_CLEAN.json modified and the
# per-round driver JSONs untracked at snapshot time.
#
# Safe to run repeatedly; commits only when there is something to commit.
set -e
cd "$(dirname "$0")/.."

git add -A \
  BENCH_r*.json MULTICHIP_r*.json BENCH_CLEAN.json COPYCHECK.json \
  SCALING_CPU_MESH.json BENCH.md BASELINE.md PROGRESS.jsonl \
  runs/ logs_* checkpoints_*/best_model.json checkpoints_*/best_model.npz \
  2>/dev/null || true

if ! git diff --cached --quiet; then
  git commit -m "round wrapup: commit driver artifacts and measurement logs"
else
  echo "wrapup: nothing to commit (audit trail already clean)"
fi
