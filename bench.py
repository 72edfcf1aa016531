#!/usr/bin/env python
"""Throughput benchmark. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: fused env+policy rollout throughput (env steps/second) on one
chip — the reference has no published throughput (BASELINE.md), so
``vs_baseline`` is measured against the north-star target of 1M env-steps/s
per chip from /root/repo/BASELINE.json.

Also measured (printed as extra JSON lines prefixed with '#' so the driver
only parses the last unprefixed line... no — driver wants exactly one line):
secondary numbers go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_ENV_STEPS_PER_S = 1_000_000.0  # north-star target (BASELINE.md)


def bench_env_only(batch: int = 8192, iters: int = 200) -> float:
    """Pure environment throughput: batched step with random legal actions."""
    from tpu2048.env import engine

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run(boards, key, steps):
        def body(c, _):
            boards, key = c
            key, k_act, k_spawn = jax.random.split(key, 3)
            moves = engine.all_moves(boards)
            logits = jnp.where(moves.action_mask, -jnp.inf, 0.0)
            all_invalid = jnp.all(moves.action_mask, axis=-1, keepdims=True)
            action = jax.random.categorical(
                k_act, jnp.where(all_invalid, 0.0, logits), axis=-1
            )
            res = engine.step(boards, action, k_spawn, moves=moves)
            # auto-reset finished games so the batch stays full
            fresh = engine.reset(k_spawn, boards.shape[:-2])
            boards = jnp.where(res.done[:, None, None], fresh, res.board)
            return (boards, key), res.reward.sum()

        (boards, _), rewards = jax.lax.scan(body, (boards, key), None, length=steps)
        return boards, rewards.sum()

    boards = jax.jit(lambda k: engine.reset(k, (batch,)))(jax.random.key(0))
    # warmup/compile
    b, r = run(boards, jax.random.key(1), 10)
    jax.block_until_ready(b)
    t0 = time.perf_counter()
    b, r = run(boards, jax.random.key(2), iters)
    jax.block_until_ready(b)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_fused_rollout(batch: int = 4096, steps: int = 256) -> float:
    """Env + policy forward + sampling, the actual training rollout path."""
    from tpu2048.algo import rollout as R
    from tpu2048.models import MLPConfig, mlp

    cfg = MLPConfig(hidden_dim=196, num_layers=2)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    apply_eval = lambda p, x: mlp.apply(p, cfg, x)

    f = jax.jit(lambda p, k: R.rollout(apply_eval, p, k, batch, steps))
    traj = f(params, jax.random.key(1))
    jax.block_until_ready(traj.total_points)
    t0 = time.perf_counter()
    traj = f(params, jax.random.key(2))
    jax.block_until_ready(traj.total_points)
    dt = time.perf_counter() - t0
    return int(np.asarray(traj.num_moves).sum()) / dt


def main() -> None:
    env_sps = bench_env_only()
    rollout_sps = bench_fused_rollout()
    print(f"# env-only step throughput: {env_sps:,.0f} env-steps/s", file=sys.stderr)
    print(f"# fused rollout throughput: {rollout_sps:,.0f} env-steps/s", file=sys.stderr)
    print(json.dumps({
        "metric": "env_steps_per_second_batched_step",
        "value": round(env_sps),
        "unit": "env-steps/s",
        "vs_baseline": round(env_sps / BASELINE_ENV_STEPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
