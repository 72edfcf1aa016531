"""Run the ACTUAL reference trainer (/root/reference) in this image, with the
two shims it needs (typer stub + the batched_rollout module it imports but
does not ship). Used for learning-curve parity evidence (BENCH.md).

Usage: python scripts/run_reference.py --steps 2000 --seed 1 --workdir /tmp/ref_s1
"""

import argparse
import os
import random
import sys
from pathlib import Path

SHIM = str(Path(__file__).resolve().parent / "reference_shim")
REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", required=True)
    # Positive-control knobs (round 4): the breakout config is
    # episodes=4 / minibatch=64 — the regime where learning actually
    # happens (BENCH.md round-2 runs broke out 2/2 there).
    ap.add_argument("--episodes", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=4)
    args = ap.parse_args()

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    os.chdir(wd)
    sys.path.insert(0, SHIM)
    sys.path.insert(1, REF)

    import torch

    random.seed(args.seed)
    torch.manual_seed(args.seed)

    import train as ref_train

    # README config (reference README.md:12), minus wandb/viz.
    ref_train.train(
        steps=args.steps, num_episodes=args.episodes,
        batch_size=args.batch_size, learning_rate=0.001, critic_lr=1e-4,
        hidden_size=196, gamma=0.99, entropy_strength=0.02, smoothness_weight=0.0,
        max_tile_weight=0.0, print_frequency=5, corner_weight=0.0,
        points_weight=0.10, show_last_steps=0, monotonicity_weight=1.0,
        model_type="mlp", critic_strength=0.2, rtg_beta=0.99,
        eval_freq=100, emptiness_weight=0.0, warmup_steps=10,
        upsample_ratio=0.25, log_dir=str(wd / "logs"),
    )


if __name__ == "__main__":
    main()
