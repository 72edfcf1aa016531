#!/usr/bin/env python
"""Throughput benchmark. Prints ONE JSON line on stdout:
{"metric": "...", "value": N, "unit": "...", "vs_baseline": N, "audit": {...}}

Headline metric: fused rollout throughput (environment + policy forward +
sampling — the actual training hot path) in env-steps/second on one chip.
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against the north-star target of 1M env-steps/s
per chip from /root/repo/BASELINE.json. Secondary numbers go to stderr.

The ``audit`` block makes the headline re-derivable by a skeptic:
  * batch, trip_count (while-loop iterations actually executed), total_moves
    (sum of real game moves — the numerator), best_seconds (the denominator).
  * total_moves < batch*trip_count because games finish at different times;
    the spread between runs (e.g. round 1's 588M vs 891M) is exactly this:
    the PRNG key changes game lengths, and one long straggler game keeps the
    whole batch iterating — throughput counts only real moves but time
    includes straggler iterations.
  * model-FLOPs MFU: achieved matmul FLOP/s vs the chip's peak. This
    workload is tiny-model / int8-board bound, so MFU is intentionally low —
    the bottleneck is per-iteration issue latency + HBM traffic, not the MXU;
    the number is reported so the claim is auditable, not to look large.
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

# Peak dense matmul throughput per chip, by device kind (bf16 / fp32-ish).
# v5e: 197 TFLOP/s bf16 (394 TOPS int8). Fallback: v5e figure.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "cpu": 5e11,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return v
    return PEAK_FLOPS["TPU v5 lite"]


def mlp_forward_flops(hidden: int, layers: int) -> int:
    """Matmul FLOPs (2*MACs) of one GameMLP forward per sample."""
    return 2 * (48 * hidden + layers * hidden * hidden + hidden * 5)


def _fetch(out):
    """Hard host barrier: materialize one leaf. On the remote-attached TPU
    platform block_until_ready can return before execution completes (the
    first 'timed' call then reads ~1 ms — observed in round 2); an actual
    device->host transfer is the only reliable barrier."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[0])


def _timeit(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fetch(fn())
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
    _fetch(run(boards, jax.random.key(1), iters))  # compile + barrier
    dt = _timeit(lambda: run(boards, jax.random.key(2), iters))
    return batch * iters / dt


def bench_fused_rollout(batch: int = 4096, steps: int = 512) -> dict:
    """Env + policy forward + sampling + trajectory recording: the actual
    training rollout (games play to completion inside the while_loop).
    Returns the full audit record."""
    from tpu2048.algo import rollout as R
    from tpu2048.models import MLPConfig, mlp

    hidden, layers = 196, 2
    cfg = MLPConfig(hidden_dim=hidden, num_layers=layers)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    apply_eval = lambda p, x: mlp.apply(p, cfg, x)

    f = jax.jit(lambda p, k: R.rollout(apply_eval, p, k, batch, steps))
    traj = f(params, jax.random.key(1))
    np.asarray(traj.num_moves)  # compile + hard barrier

    best, moves, trips = float("inf"), None, None
    per_run = []
    for i in range(3):
        t0 = time.perf_counter()
        t = f(params, jax.random.key(2 + i))
        nm = np.asarray(t.num_moves)  # the barrier IS the fetch
        dt = time.perf_counter() - t0
        m = int(nm.sum())
        tr = int(t.steps_executed)
        per_run.append(dict(seconds=round(dt, 4), total_moves=m, trip_count=tr))
        if dt < best:
            best, moves, trips = dt, m, tr

    fwd_flops = mlp_forward_flops(hidden, layers)
    hw_flops = fwd_flops * batch * trips / best  # work the chip actually did
    peak = _peak_flops()
    return dict(
        env_steps_per_second=moves / best,
        batch=batch,
        scan_cap=steps,
        trip_count=trips,
        total_moves=moves,
        best_seconds=round(best, 4),
        runs=per_run,
        model=f"mlp_h{hidden}_l{layers}",
        policy_flops_per_forward=fwd_flops,
        achieved_model_flops_per_s=round(hw_flops),
        peak_flops_bf16=peak,
        model_mfu_pct=round(100.0 * hw_flops / peak, 3),
        occupancy_pct=round(100.0 * moves / (batch * trips), 2),
    )


def urm_forward_flops(cfg) -> int:
    """Approximate matmul FLOPs (2*MACs) of one GameURM forward per board:
    16 tokens through num_loops iterations of num_layers blocks (attention
    qkv/out projections + score/value matmuls, ConvSwiGLU gate/up/conv/down),
    plus the per-cell stem and the pooled heads. Elementwise/norm work is
    excluded (matmul-only, same convention as mlp_forward_flops)."""
    h, t = cfg.hidden_dim, 16
    inter = cfg.inter
    attn = 4 * h * h + 2 * t * h  # qkv+out projections; scores+values per tok
    swiglu = 2 * h * inter + cfg.conv_kernel * inter + inter * h
    per_block_tok = 2 * (attn + swiglu)
    blocks = cfg.num_loops * cfg.num_layers
    return t * (2 * 3 * h + blocks * per_block_tok) + 2 * h * 5


def bench_rollout_urm(lanes: int = 16384, horizon: int = 128,
                      repeats: int = 3) -> dict:
    """URM-policy rollout throughput in packed (auto-reset) mode: the
    BASELINE.json north-star config names 'URM transformer policy/value
    heads, 16k parallel boards' — this row measures exactly that. Packed
    mode gives a fixed trip count (lanes*horizon real moves per run), so the
    number is occupancy-free: env-steps/s = trained-on samples/s. The URM's
    recurrent loops (num_loops x num_layers blocks over the 16-cell board
    sequence, reference game.py:1433-1449) put ~60x more matmul FLOPs per
    board than the MLP, so unlike the MLP rows this one exercises the MXU."""
    from tpu2048.algo import rollout as R
    from tpu2048.models import URMConfig, urm

    cfg = URMConfig(dropout=0.0)
    params = urm.init(jax.random.key(0), cfg, zero_heads=False)
    apply_eval = lambda p, x: urm.apply(p, cfg, x)

    f = jax.jit(lambda p, k, c: R.rollout_packed(apply_eval, p, k, c,
                                                 horizon))
    carry = jax.jit(lambda k: R.init_env_carry(k, lanes))(jax.random.key(7))
    traj, carry = f(params, jax.random.key(1), carry)
    _fetch(traj.points)  # compile + barrier

    best = float("inf")
    per_run = []
    for i in range(repeats):
        t0 = time.perf_counter()
        traj, carry = f(params, jax.random.key(2 + i), carry)
        _fetch(traj.points)
        dt = time.perf_counter() - t0
        per_run.append(dict(seconds=round(dt, 4)))
        best = min(best, dt)

    moves = lanes * horizon
    fwd = urm_forward_flops(cfg)
    hw_flops = fwd * moves / best
    peak = _peak_flops()
    return dict(
        env_steps_per_second=moves / best,
        lanes=lanes, horizon=horizon, total_moves=moves,
        best_seconds=round(best, 4), runs=per_run,
        model=(f"urm_h{cfg.hidden_dim}_l{cfg.num_layers}"
               f"_loops{cfg.num_loops}"),
        policy_flops_per_forward=fwd,
        achieved_model_flops_per_s=round(hw_flops),
        peak_flops_bf16=peak,
        model_mfu_pct=round(100.0 * hw_flops / peak, 3),
        occupancy_pct=100.0,
    )


def bench_learner(batch_size: int = 512, S: int = 8192,
                  kl_diagnostic: bool = True) -> dict:
    """PPO minibatch updates/second (forward+backward+Muon/AdamW step +
    optional KL diagnostic forward) at the README model size."""
    from tpu2048.algo import update as U
    from tpu2048.models import MLPConfig, mlp
    from tpu2048.ops import OptimizerConfig
    from tpu2048.ops import optimizer as opt

    hidden, layers = 196, 2
    cfg = MLPConfig(hidden_dim=hidden, num_layers=layers)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    labels = mlp.param_labels(params)
    ocfg = OptimizerConfig()
    state = opt.init(params, labels)
    apply_train = lambda p, x, r: mlp.apply(p, cfg, x, train=True, rng=r)
    optimize = jax.jit(U.make_optimize_fn(apply_train, labels, ocfg,
                                          batch_size, epochs=1,
                                          kl_diagnostic=kl_diagnostic))

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
        target_probs=jnp.full((S, 4), 0.25, jnp.float32),
        valid=jnp.ones((S,), jnp.bool_),
    )
    args = (jnp.float32(0.02), jnp.float32(0.2), jnp.float32(1.0))
    _fetch(optimize(params, state, ds, jax.random.key(1), *args))
    n_updates = S // batch_size
    dt = _timeit(lambda: optimize(params, state, ds, jax.random.key(2), *args))

    # fwd+bwd ~ 3x forward FLOPs (+1 forward if the KL diagnostic is on)
    fwd = mlp_forward_flops(hidden, layers)
    per_update = fwd * batch_size * (4 if kl_diagnostic else 3)
    flops = per_update * n_updates / dt
    return dict(
        updates_per_second=n_updates / dt,
        samples_per_second=S / dt,
        batch_size=batch_size,
        kl_diagnostic=kl_diagnostic,
        achieved_model_flops_per_s=round(flops),
        model_mfu_pct=round(100.0 * flops / _peak_flops(), 3),
    )


def bench_train_step(episodes: int = 256, minibatch: int = 4096,
                     repeats: int = 5, ckpt: str | None = None) -> dict:
    """Full end-to-end train step (fused rollout + advantage + augmentation +
    minibatched PPO with per-minibatch Muon/AdamW stepping) at the
    high-throughput config — the number BENCH.md's 'end-to-end' row makes a
    claim about. Times the same two jitted programs train/loop.py dispatches
    per step, two ways:

      * sync: fetch each step's packed scalars before dispatching the next —
        the pre-round-3 loop behavior; pays a full host round trip per step.
      * pipelined: dispatch all steps back-to-back, fetch afterwards — what
        train/loop.py now does by default (host work for step N overlaps
        device execution of N+1; numerics identical).

    ``ckpt``: optional checkpoint dir for the policy params. A trained policy
    plays ~4x longer games than the fresh-init policy, so steady-state
    env-steps/s is much higher than the cold-start number — both are
    reported; the headline uses the fresh-init (conservative) figure."""
    from tpu2048.algo import rollout as R
    from tpu2048.algo import update as U
    from tpu2048.train import loop as L

    cfg = L.TrainConfig(
        steps=1, learning_rate=1e-3, critic_lr=1e-4, gamma=0.99,
        entropy_strength=0.02, critic_strength=0.2, num_episodes=episodes,
        batch_size=minibatch, hidden_size=196, num_layers=2,
        points_weight=0.10, monotonicity_weight=1.0, rtg_beta=0.99,
        warmup_steps=10, upsample_ratio=0.25, kl_diagnostic=False,
        scan_cap=2048,
    )
    from tpu2048.ops import OptimizerConfig
    from tpu2048.ops import optimizer as opt
    from tpu2048.algo import advantage as A

    model_cfg, init_fn, apply_eval, apply_train, labels_fn = L.build_model(cfg)
    if ckpt:
        from tpu2048.train.evaluate import load_model_checkpoint

        params, model_cfg, _ = load_model_checkpoint(ckpt)
    else:
        params = init_fn(jax.random.key(0))
    labels = labels_fn(params)
    ocfg = OptimizerConfig(learning_rate=cfg.learning_rate,
                           critic_lr=cfg.critic_lr)
    opt_state = opt.init(params, labels)
    moments = A.RtgMoments.initial()
    optimize_fn = U.make_optimize_fn(apply_train, labels, ocfg,
                                     cfg.batch_size, cfg.ppo_epochs,
                                     kl_diagnostic=False)
    process_fn = L.make_process_fn(cfg, apply_train, labels, optimize_fn)
    rollout_fn = jax.jit(lambda p, k: R.rollout(
        apply_eval, p, k, cfg.num_episodes, cfg.rollout_cap))

    def one_step(p, o, m, k, step):
        k_roll, k_proc = jax.random.split(k)
        traj = rollout_fn(p, k_roll)
        p, o, m, out = process_fn(p, o, traj, m, k_proc, jnp.int32(step),
                                  jnp.float32(0.02))
        return p, o, m, out

    env_idx = L.SCALAR_KEYS.index("env_steps")

    # Warm-up (compile both programs) with a hard fetch.
    p, o, m = params, opt_state, moments
    p, o, m, out = one_step(p, o, m, jax.random.key(1), 1)
    _fetch(out["scalars"])

    # Sync mode: per-step barrier, exactly the --no-pipeline loop.
    best, env_steps = float("inf"), 0
    per_run = []
    for i in range(repeats):
        t0 = time.perf_counter()
        p, o, m, out = one_step(p, o, m, jax.random.key(2 + i), 2 + i)
        sc = np.asarray(out["scalars"])  # the barrier the real loop pays
        dt = time.perf_counter() - t0
        es = int(sc[env_idx])
        per_run.append(dict(seconds=round(dt, 4), env_steps=es))
        if dt < best:
            best, env_steps = dt, es

    # Pipelined mode: dispatch every step, then fetch — the default loop.
    n_pipe = max(repeats, 3)
    t0 = time.perf_counter()
    outs = []
    for i in range(n_pipe):
        p, o, m, out = one_step(p, o, m, jax.random.key(100 + i), 10 + i)
        outs.append(out)
    pipe_env_steps = sum(int(np.asarray(out["scalars"])[env_idx])
                         for out in outs)
    dt_pipe = time.perf_counter() - t0

    return dict(
        env_steps_per_second=pipe_env_steps / dt_pipe,
        seconds_per_step=round(dt_pipe / n_pipe, 4),
        env_steps_per_train_step=pipe_env_steps // n_pipe,
        sync_env_steps_per_second=env_steps / best,
        sync_seconds_per_step=round(best, 4),
        pipelined_steps_timed=n_pipe,
        episodes=episodes, minibatch=minibatch,
        model="mlp_h196_l2", kl_diagnostic=False,
        policy=("trained:" + ckpt) if ckpt else "fresh-init",
        runs=per_run,
    )


def bench_train_step_packed(lanes: int = 256, horizon: int = 384,
                            minibatch: int = 4096, repeats: int = 5,
                            ckpt: str | None = None) -> dict:
    """End-to-end train step in PACKED (auto-reset) mode: `lanes` persistent
    environments advance exactly `horizon` steps per train step (fixed-length
    scan, 100% lane occupancy by construction — every recorded step is a real
    move that is trained on; episodes cut at the chunk boundary are
    value-bootstrapped). The exact-episodes mode idles lanes at 31-38%
    occupancy waiting for the longest game (see bench_fused_rollout's audit);
    this is the designed fix (VERDICT r3 item 2, SURVEY.md §7.1 auto-reset).

    env-steps/s here counts trained-on samples: lanes*horizon per step, with
    zero discard."""
    import jax.numpy as jnp

    from tpu2048.algo import rollout as R
    from tpu2048.algo import update as U
    from tpu2048.ops import OptimizerConfig
    from tpu2048.ops import optimizer as opt
    from tpu2048.train import loop as L

    cfg = L.TrainConfig(
        steps=1, learning_rate=1e-3, critic_lr=1e-4, gamma=0.99,
        entropy_strength=0.02, critic_strength=0.2,
        packed=True, lanes=lanes, horizon=horizon,
        batch_size=minibatch, hidden_size=196, num_layers=2,
        points_weight=0.10, monotonicity_weight=1.0, rtg_beta=0.99,
        warmup_steps=10, upsample_ratio=0.25, kl_diagnostic=False,
    )
    model_cfg, init_fn, apply_eval, apply_train, labels_fn = L.build_model(cfg)
    if ckpt:
        from tpu2048.train.evaluate import load_model_checkpoint

        params, model_cfg, _ = load_model_checkpoint(ckpt)
    else:
        params = init_fn(jax.random.key(0))
    labels = labels_fn(params)
    ocfg = OptimizerConfig(learning_rate=cfg.learning_rate,
                           critic_lr=cfg.critic_lr)
    opt_state = opt.init(params, labels)
    from tpu2048.algo import advantage as A

    moments = A.RtgMoments.initial()
    optimize_fn = U.make_optimize_fn(apply_train, labels, ocfg,
                                     cfg.batch_size, cfg.ppo_epochs,
                                     kl_diagnostic=False)
    process_fn = L.make_process_fn(cfg, apply_train, labels, optimize_fn)
    rollout_fn = jax.jit(lambda p, k, c: R.rollout_packed(
        apply_eval, p, k, c, horizon))
    carry = jax.jit(lambda k: R.init_env_carry(k, lanes))(jax.random.key(7))

    def one_step(p, o, m, c, k, step):
        k_roll, k_proc = jax.random.split(k)
        traj, c = rollout_fn(p, k_roll, c)
        p, o, m, out = process_fn(p, o, traj, m, k_proc, jnp.int32(step),
                                  jnp.float32(0.02))
        return p, o, m, c, out

    # Warm-up (compile) + warm the env distribution a little.
    p, o, m = params, opt_state, moments
    p, o, m, carry, out = one_step(p, o, m, carry, jax.random.key(1), 1)
    _fetch(out["scalars"])

    # Sync mode: per-step barrier.
    best = float("inf")
    per_run = []
    for i in range(repeats):
        t0 = time.perf_counter()
        p, o, m, carry, out = one_step(p, o, m, carry, jax.random.key(2 + i),
                                       2 + i)
        np.asarray(out["scalars"])
        dt = time.perf_counter() - t0
        per_run.append(dict(seconds=round(dt, 4)))
        best = min(best, dt)

    # Pipelined mode: dispatch all, fetch afterwards (the default loop).
    n_pipe = max(repeats, 3)
    t0 = time.perf_counter()
    outs = []
    for i in range(n_pipe):
        p, o, m, carry, out = one_step(p, o, m, carry, jax.random.key(50 + i),
                                       10 + i)
        outs.append(out)
    for out in outs:
        np.asarray(out["scalars"])
    dt_pipe = time.perf_counter() - t0

    steps_per = lanes * horizon
    return dict(
        env_steps_per_second=steps_per * n_pipe / dt_pipe,
        seconds_per_step=round(dt_pipe / n_pipe, 4),
        env_steps_per_train_step=steps_per,
        sync_env_steps_per_second=steps_per / best,
        sync_seconds_per_step=round(best, 4),
        pipelined_steps_timed=n_pipe,
        lanes=lanes, horizon=horizon, minibatch=minibatch,
        occupancy_pct=100.0,  # by construction: no lane ever idles
        model="mlp_h196_l2", kl_diagnostic=False,
        policy=("trained:" + ckpt) if ckpt else "fresh-init",
        runs=per_run,
    )


def main(tiny: bool = False) -> dict:
    """Run every bench path and print the driver JSON line.

    ``tiny=True`` runs the exact same code at toy sizes so the test suite can
    execute this driver-facing entry point on CPU every run (round 2's bench
    rotted silently because nothing imported it — VERDICT r2 item 1).
    """
    import os

    if tiny:
        env_sps = bench_env_only(batch=8, iters=4)
        ro = bench_fused_rollout(batch=8, steps=16)
        learner = bench_learner(8, S=32, kl_diagnostic=True)
        learner_fast = bench_learner(16, S=32, kl_diagnostic=False)
        e2e = bench_train_step(episodes=8, minibatch=32, repeats=1)
        e2e_ss = None
        e2e_lg = None
        e2e_packed = bench_train_step_packed(lanes=8, horizon=16,
                                             minibatch=32, repeats=1)
        e2e_packed_lg = None
        ro_urm = bench_rollout_urm(lanes=8, horizon=8, repeats=1)
    else:
        env_sps = bench_env_only()
        ro = bench_fused_rollout()
        learner = bench_learner(512, kl_diagnostic=True)
        learner_fast = bench_learner(4096, S=32768, kl_diagnostic=False)
        e2e = bench_train_step()
        # Steady-state: the committed round-1 trained policy plays ~4x longer
        # games, which is what a real (warm) training run sustains.
        e2e_ss = (bench_train_step(ckpt="checkpoints_ht")
                  if os.path.isdir("checkpoints_ht") else None)
        # Large-batch HT config (1024 episodes/step): amortizes the rollout's
        # straggler trips and the learner's per-update floor — the config
        # that crosses the 1M env-steps/s end-to-end north star.
        e2e_lg = (bench_train_step(episodes=1024, ckpt="checkpoints_ht")
                  if os.path.isdir("checkpoints_ht") else None)
        # Packed (auto-reset) mode at the 256-lane config: same lane count as
        # the HT 256-episode config, horizon sized to the HT steady-state
        # sample count (~96k env steps/step) — 100% occupancy, no discard.
        e2e_packed = bench_train_step_packed(lanes=256, horizon=384)
        # and a wide-lane config that amortizes per-trip dispatch latency
        e2e_packed_lg = bench_train_step_packed(lanes=1024, horizon=256)
        # URM at the BASELINE-named 16k-parallel-boards config
        ro_urm = bench_rollout_urm(lanes=16384, horizon=128)
    err = lambda s: print(s, file=sys.stderr)
    err(f"# fused rollout (env+policy): {ro['env_steps_per_second']:,.0f} "
        f"env-steps/s ({ro['total_moves']} moves / {ro['trip_count']} trips "
        f"/ {ro['best_seconds']}s, occupancy {ro['occupancy_pct']}%, "
        f"model-MFU {ro['model_mfu_pct']}%)")
    err(f"# env-only batched step:      {env_sps:,.0f} env-steps/s")
    err(f"# learner bs=512 +KL:         {learner['updates_per_second']:,.1f} updates/s "
        f"({learner['samples_per_second']:,.0f} samples/s)")
    err(f"# learner bs=4096 no-KL:      {learner_fast['updates_per_second']:,.1f} updates/s "
        f"({learner_fast['samples_per_second']:,.0f} samples/s)")
    err(f"# end-to-end train step (HT): {e2e['env_steps_per_second']:,.0f} "
        f"env-steps/s pipelined / {e2e['sync_env_steps_per_second']:,.0f} sync "
        f"({e2e['seconds_per_step']}s/step, "
        f"{e2e['env_steps_per_train_step']} env steps/step)")
    if e2e_ss:
        err(f"# end-to-end steady-state:    {e2e_ss['env_steps_per_second']:,.0f} "
            f"env-steps/s pipelined ({e2e_ss['seconds_per_step']}s/step, "
            f"{e2e_ss['env_steps_per_train_step']} env steps/step, "
            f"{e2e_ss['policy']})")
    if e2e_lg:
        err(f"# end-to-end 1024ep steady:   {e2e_lg['env_steps_per_second']:,.0f} "
            f"env-steps/s pipelined ({e2e_lg['seconds_per_step']}s/step, "
            f"{e2e_lg['env_steps_per_train_step']} env steps/step, "
            f"{e2e_lg['policy']})")
    if e2e_packed:
        err(f"# end-to-end PACKED {e2e_packed['lanes']}x{e2e_packed['horizon']}:"
            f"   {e2e_packed['env_steps_per_second']:,.0f} env-steps/s "
            f"pipelined ({e2e_packed['seconds_per_step']}s/step, "
            f"{e2e_packed['env_steps_per_train_step']} env steps/step, "
            f"occupancy {e2e_packed['occupancy_pct']}%)")
    if e2e_packed_lg:
        err(f"# end-to-end PACKED {e2e_packed_lg['lanes']}x"
            f"{e2e_packed_lg['horizon']}: "
            f"{e2e_packed_lg['env_steps_per_second']:,.0f} env-steps/s "
            f"pipelined ({e2e_packed_lg['seconds_per_step']}s/step)")
    if ro_urm:
        err(f"# URM rollout PACKED {ro_urm['lanes']}x{ro_urm['horizon']}: "
            f"{ro_urm['env_steps_per_second']:,.0f} env-steps/s "
            f"({ro_urm['model']}, model-MFU {ro_urm['model_mfu_pct']}%)")
    audit = {
        "rollout": {k: v for k, v in ro.items() if k != "env_steps_per_second"},
        (f"rollout_urm_packed_{ro_urm['lanes']}" if ro_urm else "rollout_urm_packed"): ro_urm,
        "env_only_steps_per_second": round(env_sps),
        "learner_bs512_kl": learner,
        "learner_bs4096_nokl": learner_fast,
        "train_step_e2e_ht": e2e,
        "train_step_e2e_steady_state": e2e_ss,
        "train_step_e2e_1024ep_steady_state": e2e_lg,
        "train_step_e2e_packed_256lane": e2e_packed,
        "train_step_e2e_packed_1024lane": e2e_packed_lg,
        "device": jax.devices()[0].device_kind,
    }
    # The driver parses the LAST stdout line and its tail window truncates
    # long lines (round 3's BENCH_r03.json came back ``parsed: null`` because
    # the audit block rode inside the record). The final stdout line is
    # therefore the compact record ONLY; the full audit goes to stderr and to
    # BENCH_CLEAN.json next to this script.
    record = {
        "metric": "fused_rollout_env_steps_per_second",
        "value": round(ro["env_steps_per_second"]),
        "unit": "env-steps/s",
        "vs_baseline": round(ro["env_steps_per_second"] / BASELINE_ENV_STEPS_PER_S, 3),
    }
    err("# audit: " + json.dumps(audit))
    if not tiny:  # tiny (test) runs must not clobber the committed artifact
        try:
            clean_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_CLEAN.json")
            with open(clean_path, "w") as f:
                json.dump({**record, "audit": audit}, f, indent=1)
        except OSError as e:  # read-only checkout must not break the bench
            err(f"# (could not write BENCH_CLEAN.json: {e})")
    line = json.dumps(record)
    assert len(line) < 1024, f"driver line too long ({len(line)} bytes)"
    print(line)
    return {**record, "audit": audit}


if __name__ == "__main__":
    main(tiny="--tiny" in sys.argv[1:])
