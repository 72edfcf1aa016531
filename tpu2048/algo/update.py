"""The learner update: shuffled minibatch PPO epochs with per-minibatch
optimizer stepping (reference train.py:414-642), as one jitted program.

Faithful structural choices:
 * The optimizer steps once per MINIBATCH; the LR schedule ticks once per
   train step (train.py:567-568 vs 625) — the schedule multiplier is an input.
 * PPO epochs reshuffle and replay the same rollout (train.py:458-459).
 * After every optimizer step, a second (train-mode) forward computes the
   KL(old||new) diagnostic (train.py:577-601) — kept, because its metrics are
   part of the logging surface; disable with ``kl_diagnostic=False`` for speed.
 * The dataset is fixed-capacity with a validity mask; valid samples are
   shuffled to the front each epoch so exactly ceil(S/batch) minibatches run,
   the last one partially masked — same update count and batch composition as
   the reference's DataLoader. The minibatch loop is a ``lax.while_loop`` with
   a dynamic trip count, so one compilation serves every rollout size.

Dropout is live in both forwards (the reference keeps the model in train()
mode during optimization); each minibatch gets fresh dropout keys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.encoding import encode_boards
from ..ops import optimizer as opt
from . import losses


class Dataset(NamedTuple):
    """Flat (S_cap, ...) training samples (real rollout steps + augmented)."""

    board_before: jnp.ndarray  # (S, 4, 4) int8 — encoded lazily per minibatch
    action: jnp.ndarray  # (S,) int32
    action_mask: jnp.ndarray  # (S, 4) bool
    advantage: jnp.ndarray  # (S,) f32
    G_norm: jnp.ndarray  # (S,) f32
    logprobs: jnp.ndarray  # (S, 4) f32
    target_probs: jnp.ndarray  # (S, 4) f32 — imitation target distribution
    valid: jnp.ndarray  # (S,) bool


class OptimizeStats(NamedTuple):
    loss: jnp.ndarray
    policy_loss: jnp.ndarray
    entropy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    grad_norm: jnp.ndarray
    entropy: jnp.ndarray
    kl_total: jnp.ndarray
    kl_average: jnp.ndarray
    kl_max: jnp.ndarray
    num_batches: jnp.ndarray


def make_optimize_fn(apply_fn, labels, opt_config: opt.OptimizerConfig,
                     batch_size: int, epochs: int, kl_diagnostic: bool = True,
                     axis_name: str | None = None, objective: str = "ppo",
                     anchor=None):
    """Build optimize(params, opt_state, dataset, key, beta, critic_strength,
    schedule_mult) -> (params, opt_state, OptimizeStats).

    ``apply_fn(params, inputs, rng)`` must be the TRAIN-mode forward
    (dropout active when rng is not None).

    ``objective``: ``"ppo"`` (reference semantics) or ``"imitation"``
    (expert iteration: cross-entropy at the rollout's expert actions — see
    losses.imitation_loss). Both consume the same Dataset schema.

    ``anchor``: optional ``(anchor_apply, anchor_params, strength)`` KL trust
    region (net-new; no reference counterpart). Adds
    ``strength * KL(pi_anchor || pi)`` per sample to the loss, where the
    anchor is a FROZEN policy (eval-mode ``anchor_apply(params, inputs) ->
    (logits, value)``) — typically the warm-start checkpoint in expert
    distillation. The forward KL is mode-covering: the student must keep
    probability mass everywhere the warm-start policy had it, which blocks
    the observed failure where unconstrained imitation CE trades away the
    warm-start's competence on underrepresented (early-game) states
    (BENCH.md, "Distilling the searcher": solo eval 8,848 -> ~1,300).

    ``axis_name``: run data-parallel under shard_map over that mesh axis.
    ``batch_size`` is then the PER-DEVICE minibatch size; every device runs
    the same (pmax-synchronized) number of minibatches, losses are normalized
    by the psum'd global sample count and gradients psum'd per step, so the
    update equals one big minibatch of D x batch_size samples and parameters
    stay bit-identical across devices. Stats are psum'd to global means."""
    from functools import partial

    ar_sum = (lambda x: jax.lax.psum(x, axis_name)) if axis_name else (lambda x: x)
    ar_max = (lambda x: jax.lax.pmax(x, axis_name)) if axis_name else (lambda x: x)
    loss_impl = {"ppo": losses.ppo_loss,
                 "imitation": losses.imitation_loss,
                 "imitation_sharp": partial(losses.imitation_loss,
                                            sharp=True)}[objective]

    def loss_fn(params, batch, weights, beta, critic_strength, rng, denom):
        inputs = encode_boards(batch["board"].astype(jnp.int32))
        logits, values = apply_fn(params, inputs, rng)
        loss, stats = loss_impl(
            logits, values, batch["action"], batch["mask"], batch["advantage"],
            batch["rtg"], batch["logprobs"], weights,
            kl_strength=beta, critic_strength=critic_strength, denom=denom,
            target_probs=batch["target_probs"],
        )
        if anchor is not None:
            anchor_apply, anchor_params, strength = anchor
            a_logits, _ = anchor_apply(anchor_params, inputs)
            a_logits = jax.lax.stop_gradient(a_logits)
            _, akl_mean, _ = losses.kl_old_new(
                a_logits, logits, batch["mask"], weights, denom
            )
            loss = loss + strength * akl_mean
        return loss, (stats, logits)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def optimize(params, opt_state, dataset: Dataset, key, beta,
                 critic_strength, schedule_mult):
        S_cap = dataset.valid.shape[0]
        S = jnp.sum(dataset.valid.astype(jnp.int32))
        nb = ar_max(jnp.maximum((S + batch_size - 1) // batch_size, 0))

        zero = jnp.zeros(())
        stats0 = dict(loss=zero, policy=zero, ent_loss=zero, value=zero,
                      gnorm=zero, ent=zero, kl_total=zero, kl_avg=zero,
                      kl_max=zero)

        carry = dict(params=params, opt_state=opt_state, key=key, stats=stats0)

        for _ in range(epochs):
            k_perm, key_e, carry["key"] = jax.random.split(carry["key"], 3)
            # Shuffle valid samples to the front.
            rnd = jax.random.uniform(k_perm, (S_cap,))
            rnd = jnp.where(dataset.valid, rnd, 2.0)
            perm = jnp.argsort(rnd)
            ds = dict(
                board=jnp.take(dataset.board_before, perm, axis=0),
                action=jnp.take(dataset.action, perm),
                mask=jnp.take(dataset.action_mask, perm, axis=0),
                advantage=jnp.take(dataset.advantage, perm),
                rtg=jnp.take(dataset.G_norm, perm),
                logprobs=jnp.take(dataset.logprobs, perm, axis=0),
                target_probs=jnp.take(dataset.target_probs, perm, axis=0),
            )

            def mb_cond(c):
                return c["mb"] < nb

            def mb_body(c):
                mb = c["mb"]
                # dynamic_slice clamps the window when start+batch_size would
                # exceed capacity; mirror that clamp explicitly and weight by
                # the TRUE global sample index so overlap rows (already trained
                # by the previous minibatch) get zero weight instead of being
                # silently re-trained while tail samples are dropped.
                logical_start = mb * batch_size
                start = jnp.clip(logical_start, 0,
                                 jnp.maximum(S_cap - batch_size, 0))
                batch = {
                    k: jax.lax.dynamic_slice_in_dim(v, start, batch_size, axis=0)
                    for k, v in ds.items()
                }
                idx = start + jnp.arange(batch_size)
                weights = ((idx >= logical_start) & (idx < S)).astype(jnp.float32)
                k_drop, k_kl, new_key = jax.random.split(c["key"], 3)

                # Global sample count: psum'd so shard losses/stats sum to the
                # exact global means and psum(grads) is the exact DP gradient.
                denom = jnp.maximum(ar_sum(jnp.sum(weights)), 1.0) if axis_name else None
                (loss, (lstats, logits)), grads = grad_fn(
                    c["params"], batch, weights, beta, critic_strength, k_drop,
                    denom,
                )
                if axis_name:
                    grads = jax.lax.psum(grads, axis_name)
                    loss = ar_sum(loss)
                    lstats = jax.tree.map(ar_sum, lstats)
                new_params, new_opt_state, gnorm = opt.update(
                    grads, c["opt_state"], c["params"], labels, schedule_mult,
                    opt_config,
                )

                st = dict(c["stats"])
                if kl_diagnostic:
                    new_logits, _ = apply_fn(
                        new_params,
                        encode_boards(batch["board"].astype(jnp.int32)),
                        k_kl,
                    )
                    kl_sum, kl_mean, kl_max = losses.kl_old_new(
                        logits, new_logits, batch["mask"], weights, denom
                    )
                    st["kl_total"] = st["kl_total"] + ar_sum(kl_sum)
                    st["kl_avg"] = st["kl_avg"] + (ar_sum(kl_mean) if axis_name else kl_mean)
                    st["kl_max"] = jnp.maximum(st["kl_max"], ar_max(kl_max))
                st["loss"] = st["loss"] + loss
                st["policy"] = st["policy"] + lstats.policy_loss
                st["ent_loss"] = st["ent_loss"] + lstats.entropy_loss
                st["value"] = st["value"] + lstats.value_loss
                st["gnorm"] = st["gnorm"] + gnorm
                st["ent"] = st["ent"] + lstats.entropy
                return dict(params=new_params, opt_state=new_opt_state,
                            key=new_key, stats=st, mb=mb + 1)

            carry_mb = dict(carry, mb=jnp.zeros((), jnp.int32))
            carry_mb["key"] = key_e
            out = jax.lax.while_loop(mb_cond, mb_body, carry_mb)
            carry = dict(params=out["params"], opt_state=out["opt_state"],
                         key=carry["key"], stats=out["stats"])

        total_batches = jnp.maximum(nb * epochs, 1).astype(jnp.float32)
        st = carry["stats"]
        stats = OptimizeStats(
            loss=st["loss"] / total_batches,
            policy_loss=st["policy"] / total_batches,
            entropy_loss=st["ent_loss"] / total_batches,
            value_loss=st["value"] / total_batches,
            grad_norm=st["gnorm"] / total_batches,
            entropy=st["ent"] / total_batches,
            kl_total=st["kl_total"] / total_batches,
            kl_average=st["kl_avg"] / total_batches,
            kl_max=st["kl_max"],
            num_batches=total_batches,
        )
        return carry["params"], carry["opt_state"], stats

    return optimize
