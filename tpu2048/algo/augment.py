"""Symmetry data augmentation (reference train.py:774-881), vectorized.

The reference samples ``upsample_ratio * N`` steps and, per sampled step,
independently emits a mirrored copy (50%, random h/v axis) and a rotated copy
(50%, random 90/180/270), remapping action / action-mask / behavior logprobs
through the same permutation; advantage and normalized RTG are reused
unchanged from the source step.

Fixed-shape version: ``num_slots`` slots are drawn (with replacement — the
reference samples without replacement; at the default ratios the collision
probability is negligible and this keeps the program shape-static), each slot
yields a mirror candidate and a rotation candidate with validity flags, so the
output capacity is ``2 * num_slots``. The reference's crash on an empty
augmentation batch (train.py:1716, IndexError when upsample_ratio=0) is
deliberately NOT reproduced — empty augmentation is simply an all-invalid
buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..env import symmetry


class AugPlan(NamedTuple):
    """Compact augmentation plan: WHICH real rows to augment and HOW, without
    materializing the transformed copies. The learner materializes each
    minibatch's augmented rows on the fly (update.py), so augmentation cost
    scales with the samples actually trained on instead of the static slot
    capacity (the materialized path measured ~30 ms/step at the HT config,
    dominated by full-capacity gathers + board transforms of mostly-unused
    slots)."""

    src: jnp.ndarray  # (A,) int32 — source row in the real flat arrays
    transform: jnp.ndarray  # (A,) int32 — symmetry transform id
    valid: jnp.ndarray  # (A,) bool


def plan(key: jax.Array, num_slots: int, num_to_sample,
         flat_valid) -> AugPlan:
    """Sample the augmentation plan (reference train.py:776-808 semantics):
    ``num_to_sample`` source steps drawn uniformly among valid rows (with
    replacement), each emitting a mirror candidate (50%, random h/v) and a
    rotation candidate (50%, random 90/180/270). A = 2 * num_slots."""
    S = flat_valid.shape[0]
    k_src, k_mflag, k_maxis, k_rflag, k_rot = jax.random.split(key, 5)

    # Uniform choice among valid source steps, per slot (with replacement).
    # NOT random.categorical over an (S,) logits row: that materializes
    # num_slots x S gumbel draws (~7e10 samples at the HT config — measured
    # 1.7 s/step, 96% of the whole train step). One stable argsort packs the
    # valid indices to the front, then each slot draws a uniform rank.
    n_valid = jnp.maximum(jnp.sum(flat_valid.astype(jnp.int32)), 1)
    order = jnp.argsort(jnp.logical_not(flat_valid), stable=True)
    ranks = jax.random.randint(k_src, (num_slots,), 0, n_valid)
    src = jnp.take(order, ranks)
    slot_used = jnp.arange(num_slots) < num_to_sample

    mirror_flag = jax.random.bernoulli(k_mflag, 0.5, (num_slots,))
    mirror_tf = jnp.where(
        jax.random.bernoulli(k_maxis, 0.5, (num_slots,)),
        symmetry.MIRROR_H, symmetry.MIRROR_V,
    )
    rotate_flag = jax.random.bernoulli(k_rflag, 0.5, (num_slots,))
    rotate_tf = jax.random.randint(k_rot, (num_slots,), symmetry.ROT90,
                                   symmetry.ROT270 + 1)

    tf = jnp.concatenate([mirror_tf, rotate_tf])  # (A,)
    src2 = jnp.concatenate([src, src])
    valid = jnp.concatenate([slot_used & mirror_flag, slot_used & rotate_flag])
    valid = valid & jnp.take(flat_valid, src2)
    return AugPlan(src=src2.astype(jnp.int32), transform=tf.astype(jnp.int32),
                   valid=valid)


class AugmentedSteps(NamedTuple):
    """(A, ...) flat augmented samples, A = 2 * num_slots."""

    board_before: jnp.ndarray  # (A, 4, 4) int8 (transformed)
    board_after: jnp.ndarray  # (A, 4, 4) int8 (transformed result_state)
    action: jnp.ndarray  # (A,) int32 (remapped)
    action_mask: jnp.ndarray  # (A, 4) bool (permuted)
    logprobs: jnp.ndarray  # (A, 4) f32 (permuted)
    target_probs: jnp.ndarray  # (A, 4) f32 (permuted learning target)
    advantage: jnp.ndarray  # (A,) f32 (reused from source)
    G_norm: jnp.ndarray  # (A,) f32 (reused from source)
    points: jnp.ndarray  # (A,) i32 (for the augmented pseudo-episode stats)
    valid: jnp.ndarray  # (A,) bool


def augment(key: jax.Array, num_slots: int, num_to_sample, flat_valid,
            board_before, board_after, action, action_mask, logprobs,
            target_probs, advantage, G_norm, points) -> AugmentedSteps:
    """Sample and transform augmented steps.

    All step inputs are flat (S, ...) arrays with (S,) ``flat_valid``;
    ``num_to_sample`` is the (traced) number of slots actually used =
    int(valid_count * upsample_ratio), clipped to num_slots.

    (Materializes every slot up front — the train loop instead passes the
    AugPlan into the Dataset and lets the learner materialize lazily per
    minibatch; this eager form is kept for tests and external callers.)
    """
    p = plan(key, num_slots, num_to_sample, flat_valid)
    src2, tf = p.src, p.transform

    bb = jnp.take(board_before, src2, axis=0).astype(jnp.int32)
    ba = jnp.take(board_after, src2, axis=0).astype(jnp.int32)
    return AugmentedSteps(
        board_before=symmetry.transform_board(bb, tf).astype(jnp.int8),
        board_after=symmetry.transform_board(ba, tf).astype(jnp.int8),
        action=symmetry.transform_action(jnp.take(action, src2).astype(jnp.int32), tf),
        action_mask=symmetry.transform_action_vector(jnp.take(action_mask, src2, axis=0), tf),
        logprobs=symmetry.transform_action_vector(jnp.take(logprobs, src2, axis=0), tf),
        target_probs=symmetry.transform_action_vector(
            jnp.take(target_probs, src2, axis=0), tf),
        advantage=jnp.take(advantage, src2),
        G_norm=jnp.take(G_norm, src2),
        points=jnp.take(points, src2),
        valid=p.valid,
    )
