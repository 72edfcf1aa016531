"""Multi-chip training loop: the CLI front-end for the SPMD train step.

Activated by ``train --mesh-data N`` (N > 1): builds an N-device ('data',)
mesh, routes every step through ``parallel.make_sharded_train_step`` (env-
parallel rollout, psum'd RTG moments, DP minibatch PPO with psum'd grads) and
keeps the single-chip loop's checkpoint format so runs can be resumed or
evaluated by the same tools.

The metric surface is the reduced set the sharded step emits (avg_score,
env_steps, minibatches, RTG batch moments) — the full ~45-metric surface of
the single-chip loop requires per-step trajectory statistics that would add
collectives to the hot path; extend as needed (ROADMAP.md).
"""

from __future__ import annotations

import time
from dataclasses import asdict

import numpy as np
import jax
import jax.numpy as jnp

from ..algo import advantage as A
from ..ops import OptimizerConfig
from ..ops import optimizer as opt
from ..parallel import make_mesh, make_sharded_train_step
from ..utils import MetricLogger
from . import checkpoint as CKPT
from .loop import TrainConfig, build_model


def train_distributed(cfg: TrainConfig) -> dict:
    logger = MetricLogger(
        log_dir=cfg.log_dir, experiment_name=f"train_{cfg.model_type}_dp",
        use_wandb=cfg.use_wandb, wandb_project=cfg.wandb_project,
        wandb_run_name=cfg.wandb_run_name, wandb_config=asdict(cfg),
    )
    mesh = make_mesh(cfg.mesh_data)
    logger.print(f"Data-parallel mesh: {dict(mesh.shape)} over {cfg.mesh_data} devices")

    model_cfg, init_fn, apply_eval, apply_train, labels_fn = build_model(cfg)
    key = jax.random.key(cfg.seed)
    key, k_init = jax.random.split(key)
    params = init_fn(k_init)
    labels = labels_fn(params)
    opt_cfg = OptimizerConfig(
        learning_rate=cfg.learning_rate, critic_lr=cfg.critic_lr,
        beta1=cfg.beta1, beta2=cfg.beta2, weight_decay=cfg.weight_decay,
    )
    opt_state = opt.init(params, labels)
    moments = A.RtgMoments.initial()

    step_fn = make_sharded_train_step(
        mesh, apply_eval, apply_train, labels, opt_cfg,
        num_envs=cfg.num_episodes, max_steps=cfg.rollout_cap,
        batch_size=cfg.batch_size, epochs=cfg.ppo_epochs,
        weights=cfg.reward_weights, gamma=cfg.gamma, rtg_beta=cfg.rtg_beta,
        warmup_steps=cfg.warmup_steps, total_steps=cfg.steps,
    )

    start_step = 0
    if cfg.resume and cfg.checkpoint_dir and CKPT.checkpoint_exists(
        cfg.checkpoint_dir, "train_state"
    ):
        tree = dict(params=params, opt_state=opt_state, moments=moments,
                    key=jax.random.key_data(key))
        tree, manifest = CKPT.load_checkpoint(cfg.checkpoint_dir, "train_state", tree)
        params, opt_state, moments = tree["params"], tree["opt_state"], tree["moments"]
        key = jax.random.wrap_key_data(tree["key"])
        start_step = int(manifest["train_step"]) + 1
        logger.print(f"Resumed from step {start_step}")

    env_steps_total = 0
    t0 = time.time()
    for train_step in range(start_step, cfg.steps):
        key, k_step = jax.random.split(key)
        params, opt_state, moments, metrics = step_fn(
            params, opt_state, moments, k_step,
            jnp.int32(train_step + 1), jnp.float32(cfg.entropy_strength),
        )
        m = {k: float(v) for k, v in metrics.items()}
        env_steps_total += int(m["env_steps"])
        logger.log(
            {
                "avg_score": m["avg_score"],
                "env_steps": int(m["env_steps"]),
                "num_minibatches": int(m["num_minibatches"]),
                "rtg_batch_mean": m["batch_mean"],
                "rtg_batch_var": m["batch_var"],
            },
            step=train_step,
            verbose=train_step % cfg.print_frequency == 0,
        )

    elapsed = time.time() - t0
    if cfg.steps > start_step:
        logger.print(
            f"\nTrained {cfg.steps - start_step} steps, {env_steps_total} env "
            f"steps in {elapsed:.1f}s ({env_steps_total / max(elapsed, 1e-9):.0f} env steps/s)"
        )
    if cfg.checkpoint_dir:
        CKPT.save_checkpoint(
            cfg.checkpoint_dir, "train_state",
            arrays_tree=dict(params=params, opt_state=opt_state,
                             moments=moments, key=jax.random.key_data(key)),
            manifest=dict(train_step=cfg.steps - 1, config=asdict(cfg),
                          model_config=model_cfg.to_dict(),
                          model_type=cfg.model_type),
        )
    logger.close()
    return dict(params=params, moments=moments, env_steps_total=env_steps_total)
