#!/usr/bin/env python
"""Throughput benchmark. Prints ONE JSON line on stdout:
{"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: fused rollout throughput (environment + policy forward +
sampling — the actual training hot path) in env-steps/second on one chip.
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against the north-star target of 1M env-steps/s
per chip from /root/repo/BASELINE.json. Secondary numbers go to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_ENV_STEPS_PER_S = 1_000_000.0  # north-star target (BASELINE.md)


def _timeit(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_env_only(batch: int = 8192, iters: int = 256) -> float:
    """Pure environment throughput: batched step with random legal actions and
    auto-reset (no policy network)."""
    from tpu2048.env import engine

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
            fresh = engine.reset(k_spawn, boards.shape[:-2])
            boards = jnp.where(res.done[:, None, None], fresh, res.board)
            return (boards, key), res.reward.sum()

        (boards, _), rewards = jax.lax.scan(body, (boards, key), None, length=steps)
        return boards, rewards.sum()

    boards = jax.jit(lambda k: engine.reset(k, (batch,)))(jax.random.key(0))
    jax.block_until_ready(run(boards, jax.random.key(1), iters))  # compile
    dt = _timeit(lambda: run(boards, jax.random.key(2), iters))
    return batch * iters / dt


def bench_fused_rollout(batch: int = 4096, steps: int = 512) -> tuple:
    """Env + policy forward + sampling + trajectory recording: the actual
    training rollout (games play to completion inside the while_loop)."""
    from tpu2048.algo import rollout as R
    from tpu2048.models import MLPConfig, mlp

    cfg = MLPConfig(hidden_dim=196, num_layers=2)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    apply_eval = lambda p, x: mlp.apply(p, cfg, x)

    f = jax.jit(lambda p, k: R.rollout(apply_eval, p, k, batch, steps))
    traj = f(params, jax.random.key(1))
    jax.block_until_ready(traj.total_points)  # compile

    def once(key):
        t = f(params, key)
        return t.num_moves

    best, moves = float("inf"), None
    for i in range(3):
        t0 = time.perf_counter()
        moves = once(jax.random.key(2 + i))
        jax.block_until_ready(moves)
        best = min(best, time.perf_counter() - t0)
    total_moves = int(np.asarray(moves).sum())
    return total_moves / best, total_moves


def bench_learner(batch_size: int = 512, S: int = 8192) -> float:
    """PPO minibatch updates/second (forward+backward+Muon/AdamW step + KL
    diagnostic forward) at the README model size."""
    from tpu2048.algo import update as U
    from tpu2048.models import MLPConfig, mlp
    from tpu2048.ops import OptimizerConfig
    from tpu2048.ops import optimizer as opt

    cfg = MLPConfig(hidden_dim=196, num_layers=2)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    labels = mlp.param_labels(params)
    ocfg = OptimizerConfig()
    state = opt.init(params, labels)
    apply_train = lambda p, x, r: mlp.apply(p, cfg, x, train=True, rng=r)
    optimize = jax.jit(U.make_optimize_fn(apply_train, labels, ocfg,
                                          batch_size, epochs=1))

    rng = np.random.default_rng(0)
    boards = rng.integers(0, 10, (S, 4, 4)).astype(np.int8)
    lp = np.log(np.full((S, 4), 0.25, np.float32))
    ds = U.Dataset(
        board_before=jnp.asarray(boards),
        action=jnp.asarray(rng.integers(0, 4, S), jnp.int32),
        action_mask=jnp.zeros((S, 4), jnp.bool_),
        advantage=jnp.asarray(rng.normal(size=S), jnp.float32),
        G_norm=jnp.asarray(rng.normal(size=S), jnp.float32),
        logprobs=jnp.asarray(lp),
        valid=jnp.ones((S,), jnp.bool_),
    )
    args = (jnp.float32(0.02), jnp.float32(0.2), jnp.float32(1.0))
    out = optimize(params, state, ds, jax.random.key(1), *args)
    jax.block_until_ready(out[0])
    n_updates = S // batch_size
    dt = _timeit(lambda: optimize(params, state, ds, jax.random.key(2), *args))
    return n_updates / dt


def main() -> None:
    env_sps = bench_env_only()
    rollout_sps, total_moves = bench_fused_rollout()
    learner_ups = bench_learner()
    print(f"# fused rollout (env+policy): {rollout_sps:,.0f} env-steps/s "
          f"({total_moves} moves)", file=sys.stderr)
    print(f"# env-only batched step:      {env_sps:,.0f} env-steps/s", file=sys.stderr)
    print(f"# learner minibatch updates:  {learner_ups:,.1f} updates/s", file=sys.stderr)
    print(json.dumps({
        "metric": "fused_rollout_env_steps_per_second",
        "value": round(rollout_sps),
        "unit": "env-steps/s",
        "vs_baseline": round(rollout_sps / BASELINE_ENV_STEPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
