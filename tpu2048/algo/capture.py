"""Device-side best-episode capture for packed (auto-reset) rollouts.

Exact-episodes mode can materialize any episode straight from its (T, N)
trajectory buffers, which is how the train loop feeds the printers, the viz
exporter, and the web demo (reference train.py:81-120, 1824-1838). Packed
mode cannot: a lane holds many episodes, and a good episode *spans* chunk
boundaries (flagship games run 1,200+ moves vs a 128-512-step horizon), so
no single chunk's buffers contain it.

This module closes that gap with an on-device recorder that rides the packed
rollout scan:

  * every lane scatter-writes its current step into a per-lane episode
    buffer at position ``ep_moves`` (one vectorized scatter per step —
    negligible next to the policy forward);
  * when episodes complete (``done``), the best-scoring completion of the
    step is compared against the best episode committed so far and, if it
    wins, its lane buffer is copied into the persistent ``best_*`` buffers
    (one dynamic-slice gather + select per step, ~100 KB);
  * the train loop fetches the ``best_*`` buffers to host only on new-high
    steps / print cadence — the hot path stays transfer-free.

Episodes longer than ``cap`` moves keep overwriting the final slot: the
recorded prefix and the final move stay exact, ``best_true_len`` >
``best_len`` marks the truncation. ``cap`` defaults to the exact-mode scan
cap (2560), which no measured policy has reached.

Memory: lanes x cap x 41 B (two int8 boards + action + points + entropy)
~= 430 MB at the production 4,096-lane URM config; use
``--no-packed-capture`` to reclaim it at extreme lane counts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EpisodeRecorder(NamedTuple):
    """Carried across packed rollout chunks (a pytree of device arrays)."""

    # Per-lane in-flight episode buffers, write position = ep_moves.
    lane_before: jnp.ndarray  # (N, cap, 4, 4) i8 — board before each move
    lane_after: jnp.ndarray  # (N, cap, 4, 4) i8 — board after move + spawn
    lane_action: jnp.ndarray  # (N, cap) i8
    lane_points: jnp.ndarray  # (N, cap) i32
    lane_entropy: jnp.ndarray  # (N, cap) f32
    # Best COMPLETED episode committed so far.
    best_before: jnp.ndarray  # (cap, 4, 4) i8
    best_after: jnp.ndarray  # (cap, 4, 4) i8
    best_action: jnp.ndarray  # (cap,) i8
    best_points: jnp.ndarray  # (cap,) i32
    best_entropy: jnp.ndarray  # (cap,) f32
    best_score: jnp.ndarray  # () i32 — total points of the committed episode
    best_len: jnp.ndarray  # () i32 — moves stored (= min(true_len, cap))
    best_true_len: jnp.ndarray  # () i32 — actual episode length
    # Lanes whose in-flight episode predates this recorder (env carry was
    # restored from a checkpoint that does not persist the lane buffers):
    # their first completion would commit an episode with a zeroed prefix,
    # so commits are suppressed until the lane's next reset.
    lane_tainted: jnp.ndarray  # (N,) bool


def init_recorder(num_lanes: int, cap: int) -> EpisodeRecorder:
    return EpisodeRecorder(
        lane_tainted=jnp.zeros((num_lanes,), jnp.bool_),
        lane_before=jnp.zeros((num_lanes, cap, 4, 4), jnp.int8),
        lane_after=jnp.zeros((num_lanes, cap, 4, 4), jnp.int8),
        lane_action=jnp.zeros((num_lanes, cap), jnp.int8),
        lane_points=jnp.zeros((num_lanes, cap), jnp.int32),
        lane_entropy=jnp.zeros((num_lanes, cap), jnp.float32),
        best_before=jnp.zeros((cap, 4, 4), jnp.int8),
        best_after=jnp.zeros((cap, 4, 4), jnp.int8),
        best_action=jnp.zeros((cap,), jnp.int8),
        best_points=jnp.zeros((cap,), jnp.int32),
        best_entropy=jnp.zeros((cap,), jnp.float32),
        best_score=jnp.int32(0),
        best_len=jnp.int32(0),
        best_true_len=jnp.int32(0),
    )


def mark_resumed(rec: EpisodeRecorder, ep_moves) -> EpisodeRecorder:
    """Taint lanes restored mid-episode (ep_moves > 0): their already-played
    prefix is not in the lane buffers, so their first completion must not be
    committed as a best episode."""
    return rec._replace(lane_tainted=ep_moves > 0)


def record_step(rec: EpisodeRecorder, *, ep_moves, board_before, board_after,
                action, points, entropy, done,
                ep_points_new, ep_moves_new) -> EpisodeRecorder:
    """One packed-rollout step: write every lane's move, commit completions.

    ``ep_moves`` is the pre-step per-lane move count (the write position);
    ``ep_points_new``/``ep_moves_new`` include this step, matching the
    rollout body's accounting.
    """
    cap = rec.lane_action.shape[1]
    n = rec.lane_action.shape[0]
    lanes = jnp.arange(n)
    pos = jnp.minimum(ep_moves, cap - 1)

    rec = rec._replace(
        lane_before=rec.lane_before.at[lanes, pos].set(
            board_before.astype(jnp.int8)),
        lane_after=rec.lane_after.at[lanes, pos].set(
            board_after.astype(jnp.int8)),
        lane_action=rec.lane_action.at[lanes, pos].set(
            action.astype(jnp.int8)),
        lane_points=rec.lane_points.at[lanes, pos].set(
            points.astype(jnp.int32)),
        lane_entropy=rec.lane_entropy.at[lanes, pos].set(
            entropy.astype(jnp.float32)),
    )

    # Best completion of THIS step (if any) vs the committed best. Tainted
    # lanes (mid-episode at resume; prefix not in the buffer) never commit.
    cand_scores = jnp.where(done & ~rec.lane_tainted, ep_points_new, -1)
    cand = jnp.argmax(cand_scores)
    take = cand_scores[cand] > rec.best_score
    rec = rec._replace(lane_tainted=rec.lane_tainted & ~done)

    def grab(buf):
        return jax.lax.dynamic_index_in_dim(buf, cand, axis=0, keepdims=False)

    sel = lambda a, b: jnp.where(take, a, b)
    return rec._replace(
        best_before=sel(grab(rec.lane_before), rec.best_before),
        best_after=sel(grab(rec.lane_after), rec.best_after),
        best_action=sel(grab(rec.lane_action), rec.best_action),
        best_points=sel(grab(rec.lane_points), rec.best_points),
        best_entropy=sel(grab(rec.lane_entropy), rec.best_entropy),
        best_score=sel(ep_points_new[cand], rec.best_score),
        best_len=sel(jnp.minimum(ep_moves_new[cand], cap), rec.best_len),
        best_true_len=sel(ep_moves_new[cand], rec.best_true_len),
    )
