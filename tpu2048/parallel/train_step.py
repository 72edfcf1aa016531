"""Sharded (multi-chip) training: env-parallel rollout + data-parallel learner
via shard_map over a ('data',) mesh axis, with explicit XLA collectives.

Design (SURVEY.md §2.8, §7.5 — all net-new; the reference is single-process):

 * Rollout: each device plays ``num_envs / D`` games with a per-device PRNG
   (``fold_in(key, axis_index)``) — embarrassingly parallel, zero collectives.
 * Advantage: RTG scans are per-episode (local); the streaming normalization
   needs GLOBAL batch moments -> two ``psum`` scalars.
 * Learner: every device draws minibatches from its local shard; losses are
   normalized by the GLOBAL sample count (psum) and gradients are ``psum``-ed
   per optimizer step, so updates are bit-identical across devices and
   equivalent to one big minibatch of D x batch_size samples. All devices run
   the same (psum-maxed) number of minibatches; devices that exhaust their
   shard contribute zero-weight batches, keeping collectives in lockstep.

Gradient traffic rides ICI within a slice / DCN across slices — the program is
identical either way; only the mesh's device assignment changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..algo import advantage as A
from ..algo import losses
from ..algo import rollout as R
from ..models.encoding import encode_boards
from ..ops import optimizer as opt
from ..ops import schedules


def make_sharded_train_step(mesh: Mesh, apply_eval, apply_train, labels,
                            opt_config: opt.OptimizerConfig, *,
                            num_envs: int, max_steps: int, batch_size: int,
                            epochs: int, weights: A.RewardWeights,
                            gamma: float, rtg_beta: float, warmup_steps: int,
                            total_steps: int, kl_diagnostic: bool = False):
    """Build a jitted SPMD train step: (params, opt_state, moments, key,
    train_step, beta) -> (params, opt_state, moments, metrics).

    ``num_envs`` and ``batch_size`` are GLOBAL; both must divide by the data-
    axis size.
    """
    D = mesh.shape["data"]
    if num_envs % D or batch_size % D:
        raise ValueError(f"num_envs={num_envs} and batch_size={batch_size} "
                         f"must be divisible by data axis size {D}")
    local_envs = num_envs // D
    local_bs = batch_size // D
    T = max_steps

    def step_fn(params, opt_state, moments, key, train_step, beta):
        """Runs per-device under shard_map; params/moments replicated."""
        didx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, didx)
        k_roll, k_proc, k_opt = jax.random.split(key, 3)

        traj = R.rollout(apply_eval, params, k_roll, local_envs, T)

        adv_reward = A.step_rewards(
            traj.points, traj.mono_before, traj.mono_after,
            traj.empt_before, traj.empt_after, weights, gamma,
        )
        adv_reward = jnp.where(traj.valid, adv_reward, 0.0)
        G_raw = A.returns_to_go(adv_reward, traj.valid, gamma)

        # Global batch moments via psum.
        w = traj.valid.astype(jnp.float32)
        local_n = jnp.sum(w)
        local_sum = jnp.sum(G_raw * w)
        local_sq = jnp.sum(jnp.square(G_raw) * w)
        n = jnp.maximum(jax.lax.psum(local_n, "data"), 1.0)
        batch_mean = jax.lax.psum(local_sum, "data") / n
        batch_var = jax.lax.psum(local_sq, "data") / n - jnp.square(batch_mean)

        bias_correction = jnp.maximum(
            1.0 - rtg_beta ** jnp.maximum(train_step, 1), 1e-8
        )
        mu_c = moments.mu / bias_correction
        m2_c = moments.m2 / bias_correction
        std = jnp.sqrt(jnp.maximum(m2_c - jnp.square(mu_c), 1e-8))
        G_norm = (G_raw - mu_c) / (std + 1e-8)
        advantage = G_norm - traj.value_pred

        new_mu = rtg_beta * moments.mu + (1.0 - rtg_beta) * batch_mean
        new_m2 = rtg_beta * moments.m2 + (1.0 - rtg_beta) * (
            batch_var + jnp.square(batch_mean)
        )
        new_moments = A.RtgMoments(new_mu, new_m2, new_mu)

        # --- DP minibatch loop ---
        S_cap = T * local_envs
        flat_valid = traj.valid.reshape(S_cap)
        fb = lambda x: x.reshape((S_cap,) + x.shape[2:])
        ds = dict(
            board=fb(traj.board_before),
            action=fb(traj.action).astype(jnp.int32),
            mask=fb(traj.action_mask),
            advantage=fb(advantage),
            rtg=fb(G_norm),
            logprobs=fb(traj.logprobs),
        )
        S_local = jnp.sum(flat_valid.astype(jnp.int32))
        nb = jax.lax.pmax((S_local + local_bs - 1) // local_bs, "data")
        sched_mult = schedules.cosine_with_warmup(
            train_step - 1, warmup_steps, total_steps
        )

        def loss_fn(p, batch, wts, global_count, rng):
            inputs = encode_boards(batch["board"].astype(jnp.int32))
            logits, values = apply_train(p, inputs, rng)
            masked = jnp.where(batch["mask"], -jnp.inf, logits)
            all_invalid = jnp.all(batch["mask"], axis=-1, keepdims=True)
            lp = jax.nn.log_softmax(jnp.where(all_invalid, 0.0, masked), axis=-1)
            tgt = batch["action"][:, None]
            new_lp = jnp.take_along_axis(lp, tgt, axis=-1)[:, 0]
            old_lp = jnp.take_along_axis(batch["logprobs"], tgt, axis=-1)[:, 0]
            ratio = jnp.exp(jnp.clip(new_lp - old_lp, -20.0, 20.0))
            clipped = jnp.clip(ratio, 0.8, 1.2)
            ppo_clip = jnp.minimum(batch["advantage"] * ratio,
                                   batch["advantage"] * clipped)
            clamped = jnp.clip(masked, -20.0, 20.0)
            lp2 = jax.nn.log_softmax(clamped, axis=-1)
            ent = -jnp.sum(jnp.where(batch["mask"], 0.0, lp2 * jnp.exp(lp2)), -1)
            vl = losses.smooth_l1(values[:, 0], batch["rtg"])
            objective = ppo_clip - 1.0 * vl + beta * ent
            # Normalize by the GLOBAL count so psum(grads) = exact DP gradient.
            return -jnp.sum(objective * wts) / global_count

        def mb_cond(c):
            return c["mb"] < nb

        def mb_body(c):
            mb = c["mb"]
            start = jnp.minimum(mb * local_bs, S_cap - local_bs)
            batch = {k: jax.lax.dynamic_slice_in_dim(v, start, local_bs, 0)
                     for k, v in c["ds"].items()}
            wts = ((start + jnp.arange(local_bs)) < S_local).astype(jnp.float32)
            global_count = jnp.maximum(jax.lax.psum(jnp.sum(wts), "data"), 1.0)
            k_drop, new_key = jax.random.split(c["key"])
            grads = jax.grad(loss_fn)(c["params"], batch, wts, global_count, k_drop)
            grads = jax.lax.psum(grads, "data")
            new_params, new_opt_state, _ = opt.update(
                grads, c["opt_state"], c["params"], labels, sched_mult, opt_config
            )
            return dict(params=new_params, opt_state=new_opt_state,
                        key=new_key, ds=c["ds"], mb=mb + 1)

        # Shuffle local shard (valid first).
        k_shuf, k_opt = jax.random.split(k_opt)
        rnd = jnp.where(flat_valid, jax.random.uniform(k_shuf, (S_cap,)), 2.0)
        perm = jnp.argsort(rnd)
        ds = {k: jnp.take(v, perm, axis=0) for k, v in ds.items()}

        out = jax.lax.while_loop(
            mb_cond, mb_body,
            dict(params=params, opt_state=opt_state, key=k_opt, ds=ds,
                 mb=jnp.zeros((), jnp.int32)),
        )

        metrics = dict(
            avg_score=jax.lax.pmean(
                jnp.sum(traj.total_points.astype(jnp.float32)) / local_envs, "data"
            ),
            env_steps=jax.lax.psum(jnp.sum(traj.num_moves), "data"),
            num_minibatches=nb,
            batch_mean=batch_mean,
            batch_var=batch_var,
        )
        return out["params"], out["opt_state"], new_moments, metrics

    rep = P()
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)
