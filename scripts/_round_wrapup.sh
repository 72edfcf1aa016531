#!/usr/bin/env bash
# Round wrap-up: archive curves, refresh demo artifacts from the best
# checkpoint, final eval. Run after the high-throughput training completes.
set -e
cd "$(dirname "$0")/.."
cp logs_ht/train_mlp_20260817_001.jsonl runs/ht_config_1000steps.jsonl
cp logs_ht/train_mlp_20260817_002.jsonl runs/ht_config_resume_3000steps.jsonl
cp /tmp/ref_logs/train_mlp_20260817_001.jsonl runs/reference_readme_config.jsonl || true
python train.py export-demo --model checkpoints_ht --output web/data --num-games 128
cp checkpoints_ht/best_model.npz checkpoints_ht/best_model.json web/data/
python train.py evaluate checkpoints_ht --games 256
python scripts/plot_curves.py runs/curves.png runs/readme_config_20k_tpu.jsonl \
  runs/ht_config_1000steps.jsonl runs/ht_config_resume_3000steps.jsonl \
  runs/reference_readme_config.jsonl
