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

from ..env import symmetry
from ..models.encoding import encode_boards
from ..ops import optimizer as opt
from . import losses


class Dataset(NamedTuple):
    """Flat training samples.

    Two layouts:
      * Materialized (``aug_src is None``): every array field has S_cap rows
        (real rollout steps + materialized augmented copies), ``valid`` too.
      * Lazy augmentation (``aug_src``/``aug_tf`` set): array fields hold the
        S_real REAL rows only; ``valid`` spans S_cap = S_real + A. A virtual
        row r >= S_real is ``symmetry transform aug_tf[r - S_real]`` applied
        to real row ``aug_src[r - S_real]`` — materialized per minibatch by
        the learner, so augmentation cost scales with samples trained on,
        not slot capacity (advantage/G_norm are reused unchanged from the
        source step, reference train.py:774-881)."""

    board_before: jnp.ndarray  # (S, 4, 4) int8 — encoded lazily per minibatch
    action: jnp.ndarray  # (S,) int32
    action_mask: jnp.ndarray  # (S, 4) bool
    advantage: jnp.ndarray  # (S,) f32
    G_norm: jnp.ndarray  # (S,) f32
    logprobs: jnp.ndarray  # (S, 4) f32
    target_probs: jnp.ndarray  # (S, 4) f32 — imitation target distribution
    valid: jnp.ndarray  # (S_cap,) bool
    aug_src: jnp.ndarray | None = None  # (A,) int32 — lazy-augmentation plan
    aug_tf: jnp.ndarray | None = None  # (A,) int32


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
            # Shuffle valid samples to the front — as a PERMUTATION OF
            # INDICES only. Each minibatch gathers its own batch_size rows
            # inside the loop body, so data movement scales with the samples
            # actually trained on (S), not the static dataset capacity
            # (S_cap is T*N + augmentation slots; at the HT config the
            # up-front full-capacity gather of all 8 arrays measured ~35 ms
            # per step while touching mostly invalid rows).
            rnd = jax.random.uniform(k_perm, (S_cap,))
            rnd = jnp.where(dataset.valid, rnd, 2.0)
            perm = jnp.argsort(rnd)
            ds = dict(
                board=dataset.board_before,
                action=dataset.action,
                mask=dataset.action_mask,
                advantage=dataset.advantage,
                rtg=dataset.G_norm,
                logprobs=dataset.logprobs,
                target_probs=dataset.target_probs,
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
                rows = jax.lax.dynamic_slice_in_dim(perm, start, batch_size)
                if dataset.aug_src is not None:
                    # Lazy augmentation: rows >= S_real are virtual — gather
                    # their SOURCE real row and apply the planned symmetry
                    # transform to just this minibatch (identity transform on
                    # real rows is an exact no-op gather).
                    S_real = dataset.board_before.shape[0]
                    A = dataset.aug_src.shape[0]
                    is_aug = rows >= S_real
                    a_idx = jnp.clip(rows - S_real, 0, max(A - 1, 0))
                    src = jnp.where(is_aug, jnp.take(dataset.aug_src, a_idx),
                                    rows)
                    tf = jnp.where(is_aug, jnp.take(dataset.aug_tf, a_idx),
                                   symmetry.IDENTITY)
                    raw = {k: jnp.take(v, src, axis=0) for k, v in ds.items()}
                    batch = dict(
                        raw,
                        board=symmetry.transform_board(raw["board"], tf),
                        action=symmetry.transform_action(
                            raw["action"].astype(jnp.int32), tf),
                        mask=symmetry.transform_action_vector(raw["mask"], tf),
                        logprobs=symmetry.transform_action_vector(
                            raw["logprobs"], tf),
                        target_probs=symmetry.transform_action_vector(
                            raw["target_probs"], tf),
                    )
                else:
                    batch = {
                        k: jnp.take(v, rows, axis=0) for k, v in ds.items()
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
