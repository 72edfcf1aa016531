"""Vectorized pure-functional 2048 engine (the framework's "missing batched_rollout").

The reference walks Python ``list[list[int]]`` grids one board at a time
(reference game.py:121-330) and was *supposed* to have a batched rollout module
that never shipped (train.py:30). Here the environment is an array program:
boards are ``(..., 4, 4)`` int32 exponent tensors and one fused kernel evaluates
the slide+merge for **all four directions at once**, yielding as byproducts

  * per-direction legality  — a direction is legal iff its move changes the
    board (equivalent to the reference's can_move OR can_merge split,
    game.py:259-330),
  * per-direction merge points — the reference's ``preview_move_rewards``
    (game.py:167-184),
  * per-direction max-tile-created exponents (game.py:121-160),

so the policy's action mask, the reward preview, and the actual transition all
come out of a single pass. Everything is elementwise over the batch dimension —
no data-dependent shapes, no host round trips — and jit/vmap/shard_map
compatible.

Cell indexing convention: ``board[r][c]``, row-major; direction indices are
0=UP 1=DOWN 2=LEFT 3=RIGHT (reference game.py:1087-1092).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

GRID_SIZE = 4
NUM_CELLS = 16
NUM_ACTIONS = 4
UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3

# Tile-spawn rule (reference game.py:937-939): 90% exponent 1, 10% exponent 2.
SPAWN_P_TWO = 0.9


def merge_lines_left(lines: jnp.ndarray) -> tuple:
    """Slide+merge leftward along the last axis (length 4).

    ``lines``: (..., 4) int32 exponents. Returns (merged (...,4), score (...,),
    max_created (...,)) with the reference's semantics (game.py:225-244):
    left-priority, single merge per tile, score = sum of created tile values.

    Branchless: 3 compaction passes, one sequential merge sweep, 3 more
    compaction passes — all ``where``-selects, fully unrolled so XLA fuses the
    whole thing into one elementwise kernel over the batch.
    """
    v = [lines[..., i] for i in range(4)]

    def compress(v):
        for _ in range(3):
            for i in range(3):
                hole = v[i] == 0
                v[i], v[i + 1] = (
                    jnp.where(hole, v[i + 1], v[i]),
                    jnp.where(hole, 0, v[i + 1]),
                )
        return v

    v = compress(v)

    score = jnp.zeros(lines.shape[:-1], dtype=jnp.int32)
    max_created = jnp.zeros(lines.shape[:-1], dtype=jnp.int32)
    # Sequential sweep: a merge zeroes its right operand, so a freshly created
    # tile can never merge again this move (matches the i += 2 advance in the
    # reference's scan).
    for i in range(3):
        m = (v[i] != 0) & (v[i] == v[i + 1])
        new_exp = v[i] + 1
        score = score + jnp.where(m, jnp.left_shift(1, new_exp), 0)
        max_created = jnp.maximum(max_created, jnp.where(m, new_exp, 0))
        v[i] = jnp.where(m, new_exp, v[i])
        v[i + 1] = jnp.where(m, 0, v[i + 1])

    v = compress(v)
    return jnp.stack(v, axis=-1), score, max_created


class MoveSet(NamedTuple):
    """Results of moving in every direction, for a batch of boards.

    boards:      (4, ...B, 4, 4) post-move (pre-spawn) boards, indexed by dir
    scores:      (4, ...B) merge points per direction
    max_created: (4, ...B) max exponent created per direction
    legal:       (4, ...B) bool, move changes the board
    """

    boards: jnp.ndarray
    scores: jnp.ndarray
    max_created: jnp.ndarray
    legal: jnp.ndarray

    @property
    def action_mask(self) -> jnp.ndarray:
        """(...B, 4) bool, True = INVALID (the reference's mask convention,
        train.py:268)."""
        return jnp.logical_not(jnp.moveaxis(self.legal, 0, -1))

    @property
    def any_legal(self) -> jnp.ndarray:
        """(...B,) bool — the reference's ``has_next_step`` (game.py:103-114)."""
        return jnp.any(self.legal, axis=0)

    @property
    def preview_rewards(self) -> jnp.ndarray:
        """(...B, 4) int32 — ``preview_move_rewards`` (game.py:167-184).

        Illegal directions score 0 automatically: an unchanged board had no
        merges."""
        return jnp.moveaxis(self.scores, 0, -1)


_ALL_MOVES_BACKEND = "xla"  # or "pallas" (set_all_moves_backend)


def set_all_moves_backend(name: str) -> None:
    """Select the fused-merge implementation: 'xla' (default; elementwise
    program XLA fuses itself) or 'pallas' (the hand-scheduled cell-major
    Mosaic kernel, ops/pallas_merge.py — bit-exact, opt-in). Also settable
    via the TPU2048_MERGE_BACKEND environment variable. Takes effect at the
    next trace (call before jit-compiling the rollout)."""
    global _ALL_MOVES_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown all_moves backend {name!r}")
    _ALL_MOVES_BACKEND = name


def all_moves(boards: jnp.ndarray) -> MoveSet:
    """Evaluate the slide+merge in all four directions.

    ``boards``: (...B, 4, 4) int32. Every direction reduces to a leftward merge
    on a transformed view (reference game.py:131-151 uses the same
    transpose/reverse reduction): UP = columns, DOWN = reversed columns,
    RIGHT = reversed rows.
    """
    import os

    backend = os.environ.get("TPU2048_MERGE_BACKEND", _ALL_MOVES_BACKEND)
    if backend == "pallas" and boards.ndim == 3:
        from ..ops import pallas_merge

        return pallas_merge.all_moves(boards)
    rows_l = boards  # LEFT: rows as-is
    rows_r = boards[..., ::-1]  # RIGHT: reversed rows
    cols = jnp.swapaxes(boards, -1, -2)
    rows_u = cols  # UP: columns top-down
    rows_d = cols[..., ::-1]  # DOWN: columns bottom-up

    stacked = jnp.stack([rows_u, rows_d, rows_l, rows_r])  # (4, ...B, 4, 4)
    merged, line_scores, line_maxc = merge_lines_left(stacked)

    out_u = jnp.swapaxes(merged[UP], -1, -2)
    out_d = jnp.swapaxes(merged[DOWN][..., ::-1], -1, -2)
    out_l = merged[LEFT]
    out_r = merged[RIGHT][..., ::-1]
    out = jnp.stack([out_u, out_d, out_l, out_r])  # (4, ...B, 4, 4)

    scores = jnp.sum(line_scores, axis=-1)  # (4, ...B)
    max_created = jnp.max(line_maxc, axis=-1)
    legal = jnp.any(out != boards[None], axis=(-1, -2))
    return MoveSet(out, scores, max_created, legal)


def spawn_tile(boards: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Add a tile to a uniform-random empty cell per board (game.py:923-940).

    90% exponent 1, 10% exponent 2. Boards with no empty cell are returned
    unchanged. ``boards``: (...B, 4, 4); one independent spawn per board.
    """
    batch_shape = boards.shape[:-2]
    flat = boards.reshape(batch_shape + (NUM_CELLS,))
    empty = flat == 0
    has_empty = jnp.any(empty, axis=-1)
    k_cell, k_exp = jax.random.split(key)
    logits = jnp.where(empty, 0.0, -jnp.inf)
    # categorical over uniform logits == uniform choice among empty cells
    cell = jax.random.categorical(k_cell, logits, axis=-1)  # (...B,)
    exp = jnp.where(
        jax.random.uniform(k_exp, batch_shape) < SPAWN_P_TWO, 1, 2
    ).astype(boards.dtype)
    onehot = jax.nn.one_hot(cell, NUM_CELLS, dtype=boards.dtype)
    new_flat = flat + onehot * jnp.where(has_empty, exp, 0)[..., None]
    return new_flat.reshape(boards.shape)


def reset(key: jax.Array, batch_shape: tuple = ()) -> jnp.ndarray:
    """Fresh boards with two spawned tiles each (reference game.py:942-950)."""
    k1, k2 = jax.random.split(key)
    boards = jnp.zeros(batch_shape + (GRID_SIZE, GRID_SIZE), dtype=jnp.int32)
    return spawn_tile(spawn_tile(boards, k1), k2)


class StepResult(NamedTuple):
    board: jnp.ndarray  # (...B, 4, 4) post-spawn board
    reward: jnp.ndarray  # (...B,) int32 merge points (0 if invalid move)
    done: jnp.ndarray  # (...B,) bool — no legal move remains
    invalid: jnp.ndarray  # (...B,) bool — chosen direction was illegal
    max_created: jnp.ndarray  # (...B,) int32 max exponent created
    moves: MoveSet  # the next state's MoveSet (board after spawn)


def step(boards: jnp.ndarray, action: jnp.ndarray, key: jax.Array,
         moves: MoveSet | None = None) -> StepResult:
    """Gym-style transition (reference game.py:952-1030).

    Invalid action: board unchanged, reward 0, no spawn. Valid action: apply
    the move, spawn a tile, then check for termination. ``moves`` may pass in
    a precomputed ``all_moves(boards)`` (the rollout pipelines these so each
    board is merged exactly once per step).

    Returns the *next* state's MoveSet too, so callers chain steps without
    recomputing merges.
    """
    if moves is None:
        moves = all_moves(boards)
    batch_shape = boards.shape[:-2]
    a = jnp.broadcast_to(action, batch_shape)

    take = jnp.take_along_axis  # gather the chosen direction's outcome
    sel = a[None, ..., None, None]
    moved = jnp.squeeze(take(moves.boards, sel, axis=0), axis=0)
    reward = jnp.squeeze(take(moves.scores, a[None], axis=0), axis=0)
    max_created = jnp.squeeze(take(moves.max_created, a[None], axis=0), axis=0)
    legal = jnp.squeeze(take(moves.legal, a[None], axis=0), axis=0)

    moved = jnp.where(legal[..., None, None], moved, boards)
    reward = jnp.where(legal, reward, 0)
    max_created = jnp.where(legal, max_created, 0)

    spawned = spawn_tile(moved, key)
    # Reference: the tile spawns only after a *successful* move (game.py:1005).
    new_board = jnp.where(legal[..., None, None], spawned, boards)

    next_moves = all_moves(new_board)
    done = jnp.logical_not(next_moves.any_legal)
    return StepResult(new_board, reward, done, jnp.logical_not(legal),
                      max_created, next_moves)


def board_scores(boards: jnp.ndarray) -> jnp.ndarray:
    """Sum of tile values per board (reference game.py:63-64)."""
    vals = jnp.where(boards > 0, jnp.left_shift(1, boards), 0)
    return jnp.sum(vals, axis=(-1, -2))


def max_tile_value(boards: jnp.ndarray) -> jnp.ndarray:
    """Largest tile value (2**max_exp, 0 for an empty board)."""
    m = jnp.max(boards, axis=(-1, -2))
    return jnp.where(m > 0, jnp.left_shift(1, m), 0)
