"""Value-guided expectimax search — a net-new inference capability the
reference lacks (its `play` command only compares per-direction immediate
rewards, train.py:2229-2261).

The batched engine makes exact one-ply expectimax cheap on TPU: for every
board and every legal action, enumerate ALL 32 possible tile spawns (16 cells
x {2 with p=.9, 4 with p=.1}) on the merged board and score the action as

    score(a) = points_coef * merge_points(a)
             + value_coef  * E_spawn[ V(s') ]

with the critic as the leaf evaluator. Since the critic is trained in
normalized return space (G - mu)/sigma, the caller supplies
``value_coef = gamma * sigma`` (denormalization up to an action-independent
constant) and ``points_coef = points_weight`` to put both terms in trained
reward units; the argmax is invariant to the common scale. One fused program
evaluates N games x 4 actions x 32 spawns per move — ~128N critic forwards,
trivially batched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..env import engine
from ..models.encoding import encode_boards

NUM_CELLS = 16
NUM_SPAWNS = 2 * NUM_CELLS  # 16 cells x {exp 1 (p=.9), exp 2 (p=.1)}


def expectimax_scores(apply_fn, params, boards: jnp.ndarray,
                      moves: engine.MoveSet | None = None,
                      points_coef: float = 0.1,
                      value_coef: float = 1.0,
                      depth: int = 1) -> jnp.ndarray:
    """(B, 4) action scores; illegal actions are -inf.

    ``apply_fn(params, x(B,48)) -> (logits, value)`` — only the value head is
    consumed. Exact chance-node expectation: every legal 2048 move leaves at
    least one empty cell, so the spawn distribution is always well-defined.

    ``depth`` is the number of max-node plies. depth=1 evaluates every spawn
    child with the critic; depth=2 values every spawn child by ITS best 1-ply
    expectimax score (exact 2-ply tree, 4x32x4x32 leaves per board), with
    terminal children correctly valued 0 (game over ends the return). The
    chance dimension is evaluated with a sequential ``lax.map`` over the 32
    spawn slots so peak memory stays at one 1-ply problem of size 4B.
    """
    if moves is None:
        moves = engine.all_moves(boards)
    merged = moves.boards  # (4, B, 4, 4)
    D, B = merged.shape[0], merged.shape[1]

    flat = merged.reshape(D, B, NUM_CELLS)
    empty = flat == 0  # (4, B, 16)
    n_empty = jnp.maximum(empty.sum(-1), 1)  # (4, B)

    # Candidate children: set cell c to exponent e on each merged board.
    cell_hot = jnp.eye(NUM_CELLS, dtype=flat.dtype)  # (16, 16)
    cand = flat[:, :, None, None, :] + \
        cell_hot[None, None, :, None, :] * jnp.asarray([1, 2], flat.dtype)[None, None, None, :, None]
    # cand: (4, B, 16 cells, 2 exps, 16) — only valid where the cell was empty.
    weights = jnp.where(
        empty[:, :, :, None],
        jnp.asarray([0.9, 0.1])[None, None, None, :] / n_empty[:, :, None, None],
        0.0,
    )  # (4, B, 16, 2) sums to 1 over (cells, exps) for each (dir, board)

    if depth <= 1:
        child_boards = cand.reshape(D * B * NUM_SPAWNS, 4, 4)
        _, values = apply_fn(params, encode_boards(child_boards))
        values = values.reshape(D, B, NUM_CELLS, 2)
    else:
        # (D, B, 16, 2, 16) -> (32 spawn slots, D*B, 4, 4): one sequential
        # sweep over the chance dimension, each slot a batched (depth-1)
        # subproblem over all D*B children at once.
        child = jnp.moveaxis(cand.reshape(D * B, NUM_SPAWNS, 4, 4), 1, 0)
        values = jax.lax.map(
            lambda bs: best_scores(apply_fn, params, bs, points_coef,
                                   value_coef, depth - 1),
            child)  # (32, D*B)
        values = values.T.reshape(D, B, NUM_CELLS, 2)
    ev = jnp.sum(values * weights, axis=(-2, -1))  # (4, B)

    score = points_coef * moves.scores.astype(jnp.float32) + value_coef * ev
    score = jnp.where(moves.legal, score, -jnp.inf)
    return jnp.moveaxis(score, 0, -1)  # (B, 4)


def best_scores(apply_fn, params, boards: jnp.ndarray,
                points_coef: float = 0.1, value_coef: float = 1.0,
                depth: int = 1) -> jnp.ndarray:
    """(B,) best expectimax score over legal actions; 0 for terminal boards
    (no legal action => the game is over, so the future return is exactly 0)."""
    moves = engine.all_moves(boards)
    s = expectimax_scores(apply_fn, params, boards, moves, points_coef,
                          value_coef, depth)
    return jnp.where(moves.any_legal, jnp.max(s, axis=-1), 0.0)


@partial(jax.jit,
         static_argnames=("apply_fn", "num_envs", "max_steps", "depth"))
def search_rollout(apply_fn, params, num_envs: int, max_steps: int,
                   env_key: jax.Array, points_coef: float = 0.1,
                   value_coef: float = 1.0, depth: int = 1):
    """Play ``num_envs`` games to completion with expectimax action selection
    (deterministic given the env stream). Returns (total_points (N,),
    final_boards (N,4,4), num_moves (N,))."""
    k_reset, k_env = jax.random.split(env_key)
    boards = engine.reset(k_reset, (num_envs,))

    def cond(c):
        return jnp.logical_and(c["t"] < max_steps, jnp.any(c["alive"]))

    def body(c):
        boards, key = c["boards"], c["key"]
        key, k_spawn = jax.random.split(key)
        moves = engine.all_moves(boards)
        scores = expectimax_scores(apply_fn, params, boards, moves,
                                   points_coef, value_coef, depth)
        action = jnp.argmax(scores, axis=-1)
        res = engine.step(boards, action, k_spawn, moves=moves)
        alive = c["alive"] & moves.any_legal
        pts = c["points"] + jnp.where(alive, res.reward, 0)
        boards = jnp.where(alive[:, None, None], res.board, boards)
        nm = c["num_moves"] + alive.astype(jnp.int32)
        return dict(boards=boards, key=key, alive=alive & ~res.done,
                    points=pts, num_moves=nm, t=c["t"] + 1)

    out = jax.lax.while_loop(cond, body, dict(
        boards=boards, key=k_env,
        alive=jnp.ones((num_envs,), jnp.bool_),
        points=jnp.zeros((num_envs,), jnp.int32),
        num_moves=jnp.zeros((num_envs,), jnp.int32),
        t=jnp.int32(0),
    ))
    return out["points"], out["boards"], out["num_moves"]
