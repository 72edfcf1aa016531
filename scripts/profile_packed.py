#!/usr/bin/env python
"""Split timing of the PACKED train step (VERDICT r4 item 5: the 256-lane
sync number). Times rollout_packed and process_fn separately with hard fetch
barriers, then the fused sequence both sync and pipelined — so the residual
fixed overhead (dispatch + scalar fetch round trip over the tunnel) is
pinned apart from device work.

Usage: python scripts/profile_packed.py [lanes] [horizon] [minibatch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from tpu2048.train.loop import TrainConfig, build_model, make_process_fn
from tpu2048.algo import rollout as R, update as U, advantage as A
from tpu2048.ops import OptimizerConfig, optimizer as opt

lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 384
minibatch = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

cfg = TrainConfig(steps=100, num_episodes=lanes, batch_size=minibatch,
                  hidden_size=196, num_layers=2, points_weight=0.10,
                  monotonicity_weight=1.0, critic_strength=0.2, rtg_beta=0.99,
                  warmup_steps=10, upsample_ratio=0.25, kl_diagnostic=False,
                  packed=True, lanes=lanes, horizon=horizon)
model_cfg, init_fn, apply_eval, apply_train, labels_fn = build_model(cfg)
params = init_fn(jax.random.key(0))
labels = labels_fn(params)
opt_state = opt.init(params, labels)
moments = A.RtgMoments.initial()
opt_cfg = OptimizerConfig(learning_rate=1e-3, critic_lr=1e-4)
optimize_fn = U.make_optimize_fn(apply_train, labels, opt_cfg, minibatch,
                                 cfg.ppo_epochs, kl_diagnostic=False)
process_fn = make_process_fn(cfg, apply_train, labels, optimize_fn)
rollout_fn = jax.jit(lambda p, k, c: R.rollout_packed(apply_eval, p, k, c,
                                                      horizon))

carry = R.init_env_carry(jax.random.key(7), lanes)


def fetch(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


# warm-up compiles
traj, carry = rollout_fn(params, jax.random.key(1), carry)
fetch(traj.points)
out = process_fn(params, opt_state, traj, moments, jax.random.key(2),
                 jnp.int32(50), jnp.float32(0.02))
fetch(out[3]["scalars"])

print(f"config: {lanes} lanes x {horizon} horizon, minibatch {minibatch}, "
      f"mlp_h196_l2, {lanes * horizon} env-steps/step")

for i in range(4):
    t0 = time.perf_counter()
    traj, carry = rollout_fn(params, jax.random.key(10 + i), carry)
    fetch(traj.points)
    t1 = time.perf_counter()
    p2, o2, m2, outs = process_fn(params, opt_state, traj, moments,
                                  jax.random.key(20 + i), jnp.int32(50),
                                  jnp.float32(0.02))
    sc = np.asarray(outs["scalars"])
    t2 = time.perf_counter()
    print(f"run{i}: rollout {t1 - t0:.4f}s  process+fetch {t2 - t1:.4f}s  "
          f"total {t2 - t0:.4f}s -> "
          f"{lanes * horizon / (t2 - t0):,.0f} env-steps/s split-sync")

# Fused sequence, sync (one fetch per step, no inter-stage barrier).
best = float("inf")
for i in range(4):
    t0 = time.perf_counter()
    traj, carry = rollout_fn(params, jax.random.key(30 + i), carry)
    p2, o2, m2, outs = process_fn(params, opt_state, traj, moments,
                                  jax.random.key(40 + i), jnp.int32(50),
                                  jnp.float32(0.02))
    sc = np.asarray(outs["scalars"])
    best = min(best, time.perf_counter() - t0)
print(f"sync      best {best:.4f}s/step -> "
      f"{lanes * horizon / best:,.0f} env-steps/s")

# Pipelined: dispatch N steps, fetch after.
n = 6
t0 = time.perf_counter()
outs_l = []
for i in range(n):
    traj, carry = rollout_fn(params, jax.random.key(50 + i), carry)
    p2, o2, m2, outs = process_fn(params, opt_state, traj, moments,
                                  jax.random.key(60 + i), jnp.int32(50),
                                  jnp.float32(0.02))
    outs_l.append(outs)
for o in outs_l:
    np.asarray(o["scalars"])
dt = (time.perf_counter() - t0) / n
print(f"pipelined best {dt:.4f}s/step -> "
      f"{lanes * horizon / dt:,.0f} env-steps/s")
