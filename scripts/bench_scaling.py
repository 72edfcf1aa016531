#!/usr/bin/env python
"""Multi-chip scaling benchmark harness (SURVEY.md §7.5).

Measures the SPMD train step (env-parallel rollout + DP minibatch PPO,
parallel/train_step.py) across mesh sizes and reports throughput + scaling
efficiency vs the 1-device run, in BOTH rollout modes:

  * exact-episodes (the curve-parity default; while_loop to completion)
  * packed auto-reset lanes (the production throughput mode, round 4+)

On real multi-chip hardware this measures ICI scaling; run with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate the harness on a virtual mesh (numbers then reflect host cores,
not TPUs).

Usage: python scripts/bench_scaling.py [--devices 1 2 4 8]
         [--envs-per-device 64] [--modes exact packed]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

import jax

# The axon TPU plugin pins the platform regardless of the JAX_PLATFORMS env
# var (observed round 5: env JAX_PLATFORMS=cpu still yielded the TPU); the
# post-import config update is the only override that sticks. Without it a
# "CPU-mesh" run silently lands on the real chip and can contend with a
# training job.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


def bench_mesh(n_devices: int, envs_per_device: int, max_steps: int,
               batch_per_device: int, repeats: int = 3,
               packed: bool = False, horizon: int = 256) -> float:
    import numpy as np

    from tpu2048.algo.advantage import RtgMoments
    from tpu2048.ops import OptimizerConfig
    from tpu2048.ops import optimizer as opt
    from tpu2048.parallel import make_mesh, make_sharded_train_step
    from tpu2048.train.loop import SCALAR_KEYS, TrainConfig, build_model

    mesh = make_mesh(n_devices)
    cfg = TrainConfig(
        steps=100, num_episodes=envs_per_device * n_devices,
        batch_size=batch_per_device * n_devices, scan_cap=max_steps,
        hidden_size=196, num_layers=2, warmup_steps=10,
        points_weight=0.1, monotonicity_weight=1.0, upsample_ratio=0.25,
        critic_strength=0.2, rtg_beta=0.99, kl_diagnostic=False,
        mesh_data=n_devices,
        packed=packed, lanes=envs_per_device * n_devices, horizon=horizon,
    )
    model_cfg, init_fn, apply_eval, apply_train, labels_fn = build_model(cfg)
    params = init_fn(jax.random.key(0))
    labels = labels_fn(params)
    step = make_sharded_train_step(
        mesh, cfg, apply_eval, apply_train, labels,
        OptimizerConfig(learning_rate=1e-3, critic_lr=1e-4),
    )
    env_idx = SCALAR_KEYS.index("env_steps")
    if packed:
        from tpu2048.parallel.train_step import init_sharded_env_carry

        carry = init_sharded_env_carry(mesh, jax.random.key(7), cfg.lanes)

        def run(k):
            nonlocal carry
            p, o, m, carry, traj, out = step(
                params, opt_state, moments, carry, k, jnp.int32(20),
                jnp.float32(0.02))
            return out

    else:
        def run(k):
            p, o, m, traj, out = step(params, opt_state, moments, k,
                                      jnp.int32(20), jnp.float32(0.02))
            return out

    opt_state, moments = opt.init(params, labels), RtgMoments.initial()
    np.asarray(run(jax.random.key(1))["scalars"])  # compile + hard barrier
    best, env_steps = float("inf"), None
    for i in range(repeats):
        t0 = time.perf_counter()
        sc = np.asarray(run(jax.random.key(2 + i))["scalars"])  # fetch = barrier
        best = min(best, time.perf_counter() - t0)
        env_steps = int(sc[env_idx])
    return env_steps / best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--envs-per-device", type=int, default=64)
    ap.add_argument("--max-steps", type=int, default=256)
    ap.add_argument("--batch-per-device", type=int, default=128)
    ap.add_argument("--horizon", type=int, default=256,
                    help="Packed mode: env steps per lane per train step")
    ap.add_argument("--modes", nargs="+", default=["exact", "packed"],
                    choices=["exact", "packed"])
    ap.add_argument("--json-out", default=None,
                    help="Write the weak-scaling table to this JSON file")
    args = ap.parse_args()

    avail = len(jax.devices())
    platform = jax.devices()[0].platform
    sizes = args.devices or [d for d in (1, 2, 4, 8, 16, 32) if d <= avail]
    rows = []
    print(f"devices available: {avail} ({platform})")
    for mode in args.modes:
        packed = mode == "packed"
        base = None
        for n in sizes:
            sps = bench_mesh(n, args.envs_per_device, args.max_steps,
                             args.batch_per_device, packed=packed,
                             horizon=args.horizon)
            if base is None:
                base = sps
            eff = sps / (base * n) * 100
            rows.append(dict(mode=mode, mesh=n,
                             env_steps_per_second=round(sps),
                             weak_scaling_efficiency_pct=round(eff, 1)))
            print(f"{mode:6s} mesh={n:3d}  {sps:12,.0f} env-steps/s  "
                  f"efficiency {eff:6.1f}%")

    if args.json_out:
        import json
        import os

        doc = dict(
            harness="scripts/bench_scaling.py",
            workload=dict(envs_per_device=args.envs_per_device,
                          batch_per_device=args.batch_per_device,
                          max_steps=args.max_steps, horizon=args.horizon,
                          model="mlp_h196_l2", upsample_ratio=0.25),
            platform=platform,
            devices_available=avail,
            host_cpus=os.cpu_count(),
            note=("Weak scaling of the SPMD train step "
                  "(parallel/train_step.py) in exact-episodes AND packed "
                  "auto-reset modes. On a virtual CPU mesh the efficiency "
                  "column reflects host-core oversubscription, not ICI — "
                  "the artifact validates the harness shape; run on real "
                  "multi-chip hardware for the ICI number."),
            rows=rows,
        )
        with open(args.json_out, "w") as f:
            json.dump(doc, f, indent=2)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
