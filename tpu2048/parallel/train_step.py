"""Sharded (multi-chip) training: env-parallel rollout + data-parallel learner
via shard_map over a ('data',) mesh axis, with explicit XLA collectives.

Design (SURVEY.md §2.8, §7.5 — all net-new; the reference is single-process):

 * This is the SAME program as the single-chip trainer — the shard_map body
   calls the identical ``algo.rollout`` + ``train.loop.make_process_fn`` /
   ``algo.update.make_optimize_fn`` code, built with ``axis_name='data'`` so
   the RTG batch moments, gradients, and every logged statistic reduce
   globally. Full feature parity (augmentation, critic_strength, adaptive
   beta, KL diagnostic, the ~45-metric surface) is parity by construction,
   and ``tests/test_parallel.py`` asserts sharded(D=1) == single-chip
   numerically.
 * Rollout: each device plays ``num_envs / D`` games with a per-device PRNG
   (``fold_in(key, axis_index)``) — embarrassingly parallel, zero collectives.
 * Learner: every device draws minibatches from its local shard; losses are
   normalized by the GLOBAL sample count (psum) and gradients ``psum``-ed per
   optimizer step, so updates are bit-identical across devices and equivalent
   to one big minibatch of D x batch_size samples. All devices run the same
   (pmax-synchronized) number of minibatches; devices that exhaust their shard
   contribute zero-weight batches, keeping collectives in lockstep.

Gradient traffic rides ICI within a slice / DCN across slices — the program is
identical either way; only the mesh's device assignment changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..algo import rollout as R
from ..algo import update as U
from ..ops import optimizer as opt

AXIS = "data"


def _packed_traj_specs() -> "R.PackedTrajectory":
    """PartitionSpecs for a PackedTrajectory: (T, N, ...) step buffers are
    lane-sharded on axis 1, the (N,) bootstrap on axis 0, the static trip
    count replicated."""
    tn = P(None, AXIS)
    return R.PackedTrajectory(
        board_before=tn, board_after=tn, action=tn, target_action=tn,
        target_probs=tn, logprobs=tn, action_mask=tn, value_pred=tn,
        entropy=tn, points=tn, preview=tn, max_created=tn, mono_before=tn,
        mono_after=tn, empt_before=tn, empt_after=tn, valid=tn, done_here=tn,
        ep_start=tn, ep_score=tn, ep_len=tn, ep_tile=tn,
        boot_value=P(AXIS), steps_executed=P(),
    )


def _carry_specs() -> R.EnvCarry:
    """EnvCarry crossing shard_map: every leaf lane-sharded along ``data``.
    The env RNG key rides as RAW key data with a leading per-device axis of
    size 1 (typed key arrays are scalar and cannot carry a sharded axis);
    the step body wraps/unwraps it."""
    return R.EnvCarry(boards=P(AXIS), env_key=P(AXIS), ep_points=P(AXIS),
                      ep_moves=P(AXIS))


def init_sharded_env_carry(mesh: Mesh, env_key, num_lanes: int) -> R.EnvCarry:
    """Per-shard EnvCarry: each device initializes its own ``num_lanes / D``
    lanes with a fold_in-distinct env stream."""
    D = mesh.shape[AXIS]
    local = num_lanes // D

    def make(key):
        didx = jax.lax.axis_index(AXIS)
        c = R.init_env_carry(jax.random.fold_in(key, didx), local)
        return c._replace(env_key=jax.random.key_data(c.env_key)[None])

    f = shard_map(make, mesh=mesh, in_specs=(P(),), out_specs=_carry_specs(),
                  check_vma=False)
    return jax.jit(f)(env_key)


def _traj_specs() -> R.Trajectory:
    """PartitionSpecs for a Trajectory coming out of shard_map: (T, N, ...)
    step buffers are env-sharded on axis 1, (N,) episode summaries on axis 0,
    and the while-loop trip count is replicated (pmax'd in the body)."""
    tn = P(None, AXIS)
    n = P(AXIS)
    return R.Trajectory(
        board_before=tn, board_after=tn, action=tn, target_action=tn,
        target_probs=tn, logprobs=tn,
        action_mask=tn, value_pred=tn, entropy=tn, points=tn, preview=tn,
        max_created=tn, mono_before=tn, mono_after=tn, empt_before=tn,
        empt_after=tn, valid=tn, done_here=tn,
        final_board=n, total_points=n, num_moves=n, ended=n,
        steps_executed=P(),
    )


def make_sharded_train_step(mesh: Mesh, cfg, apply_eval, apply_train, labels,
                            opt_config: opt.OptimizerConfig, anchor=None):
    """Build the jitted SPMD train step for a ('data',) mesh:

        (params, opt_state, moments, key, train_step, beta)
            -> (params, opt_state, moments, traj, outputs)

    ``cfg`` is the full TrainConfig; ``cfg.num_episodes`` and
    ``cfg.batch_size`` are GLOBAL and must divide by the data-axis size.
    ``traj`` comes back as the global (T, num_episodes, ...) trajectory and
    ``outputs`` carries the packed SCALAR_KEYS vector + (T, N) advantages —
    the same contract as the single-chip rollout_fn + process_fn pair.
    """
    from ..train.loop import make_process_fn

    D = mesh.shape[AXIS]
    packed = getattr(cfg, "packed", False)
    global_envs = cfg.packed_lanes if packed else cfg.num_episodes
    if global_envs % D or cfg.batch_size % D:
        raise ValueError(
            f"{'lanes' if packed else 'num_episodes'}={global_envs} and "
            f"batch_size={cfg.batch_size} "
            f"must be divisible by data axis size {D}"
        )
    local_envs = global_envs // D
    local_bs = cfg.batch_size // D
    T = cfg.horizon if packed else cfg.rollout_cap

    optimize_fn = U.make_optimize_fn(
        apply_train, labels, opt_config, local_bs, cfg.ppo_epochs,
        kl_diagnostic=cfg.kl_diagnostic, axis_name=AXIS,
        objective=((("imitation_sharp" if getattr(cfg, "expert_sharp", True)
                     else "imitation"))
                   if getattr(cfg, "expert_iter", False) else "ppo"),
        anchor=anchor,
    )
    process = make_process_fn(cfg, apply_train, labels, optimize_fn,
                              axis_name=AXIS, num_envs_local=local_envs,
                              _jit=False)

    # Frozen teacher (--expert-src): load params + denormalization coefs ONCE,
    # exactly like the single-chip path (train/loop.py). Round-2 ADVICE flagged
    # that this path silently fell back to the live-learner teacher — the
    # configuration BENCH.md expC documents as imploding training.
    e_apply = e_params = e_coefs = None
    if getattr(cfg, "expert_iter", False) and getattr(cfg, "expert_src", None):
        from ..models import mlp, urm
        from ..train.evaluate import load_model_checkpoint, load_search_coefs

        e_params, e_mc, e_mt = load_model_checkpoint(cfg.expert_src)
        e_coefs = load_search_coefs(cfg.expert_src)
        if e_mt == "urm":
            e_apply = lambda p, x: urm.apply(p, e_mc, x)
        else:
            e_apply = lambda p, x: mlp.apply(p, e_mc, x)

    if packed:
        def packed_step_fn(params, opt_state, moments, carry, key,
                           train_step, beta):
            didx = jax.lax.axis_index(AXIS)
            key = jax.random.fold_in(key, didx)
            k_roll, k_proc = jax.random.split(key)
            local_carry = carry._replace(
                env_key=jax.random.wrap_key_data(carry.env_key[0]))
            traj, new_carry = R.rollout_packed(apply_eval, params, k_roll,
                                               local_carry, T)
            new_carry = new_carry._replace(
                env_key=jax.random.key_data(new_carry.env_key)[None])
            new_params, new_opt_state, new_moments, outputs = process(
                params, opt_state, traj, moments, k_proc, train_step, beta
            )
            return (new_params, new_opt_state, new_moments, new_carry, traj,
                    outputs)

        rep = P()
        sharded = shard_map(
            packed_step_fn, mesh=mesh,
            in_specs=(rep, rep, rep, _carry_specs(), rep, rep, rep),
            out_specs=(rep, rep, rep, _carry_specs(), _packed_traj_specs(),
                       dict(scalars=rep, advantage=P(None, AXIS))),
            check_vma=False,
        )
        return jax.jit(sharded)

    def step_fn(params, opt_state, moments, key, train_step, beta):
        didx = jax.lax.axis_index(AXIS)
        key = jax.random.fold_in(key, didx)
        k_roll, k_proc = jax.random.split(key)
        if getattr(cfg, "expert_iter", False):
            if e_apply is not None:
                traj = R.rollout(apply_eval, params, k_roll, local_envs, T,
                                 expert_depth=cfg.expert_depth,
                                 expert_coefs=e_coefs,
                                 expert_mix=getattr(cfg, "expert_mix", 1.0),
                                 expert_tau=getattr(cfg, "expert_tau", 0.0),
                                 expert_apply=e_apply,
                                 expert_params=e_params,
                                 expert_bf16=getattr(cfg, "expert_bf16", False))
            else:
                from ..algo import search as SRCH

                coefs = SRCH.coefs_from_moments(
                    moments, train_step, cfg.points_weight,
                    cfg.monotonicity_weight, cfg.emptiness_weight, cfg.gamma,
                    cfg.rtg_beta)
                traj = R.rollout(apply_eval, params, k_roll, local_envs, T,
                                 expert_depth=cfg.expert_depth,
                                 expert_coefs=coefs,
                                 expert_mix=getattr(cfg, "expert_mix", 1.0),
                                 expert_tau=getattr(cfg, "expert_tau", 0.0),
                                 expert_bf16=getattr(cfg, "expert_bf16", False))
        else:
            traj = R.rollout(apply_eval, params, k_roll, local_envs, T)
        new_params, new_opt_state, new_moments, outputs = process(
            params, opt_state, traj, moments, k_proc, train_step, beta
        )
        traj = traj._replace(
            steps_executed=jax.lax.pmax(traj.steps_executed, AXIS)
        )
        return new_params, new_opt_state, new_moments, traj, outputs

    rep = P()
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep),
        out_specs=(rep, rep, rep, _traj_specs(),
                   dict(scalars=rep, advantage=P(None, AXIS))),
        check_vma=False,
    )
    return jax.jit(sharded)
