"""Value-guided expectimax search — a net-new inference capability the
reference lacks (its `play` command only compares per-direction immediate
rewards, train.py:2229-2261).

The batched engine makes exact expectimax cheap on TPU: for every board and
every legal action, enumerate ALL 32 possible tile spawns (16 cells x
{2 with p=.9, 4 with p=.1}) on the merged board. Scoring is the exact
Bellman backup of the TRAINED objective. The critic is trained in
normalized space on the shaped reward (algo/advantage.py, algo/rollout.py)

    r(s, a, s') = points*pts(a) + gamma*phi(m_a)*1[s' alive] - phi(s),
    phi(s)      = mono_w*monotonicity(s) + empt_w*emptiness(s),

with the after-potential evaluated on the merged board m_a BEFORE the spawn
and zeroed on the game-ending move (reference parity: heuristics-before-
spawn, terminal-PBRS zeroing). With SV(s') the shaped state value — exactly
0 when s' is terminal, ``sigma*V(s') + mu`` from the critic at the leaves —
the action score, up to the action-independent constant ``-phi(s)``, is

    score(a) = points*pts(a) + gamma * E_spawn[ 1[alive] * (phi(m_a) + SV(child)) ]

and the PBRS terms telescope: maximizing this is maximizing the raw points
return the shaping was designed not to distort.

The first version of this module dropped phi and mu, valued dead spawn
children by critic extrapolation (boards the critic never trains on), and
rescaled the depth-2 recursion by sigma a second time; measured on the expA
checkpoint, its depth-1 search *trailed* the raw greedy policy (BENCH.md).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..env import engine
from ..env import heuristics as H
from ..models.encoding import encode_boards

NUM_CELLS = 16
NUM_SPAWNS = 2 * NUM_CELLS  # 16 cells x {exp 1 (p=.9), exp 2 (p=.1)}


class SearchCoefs(NamedTuple):
    """Coefficients tying search scores to the trained objective. Defaults
    are the params-only fallback: pure normalized-EV search (critic leaves,
    terminal masking, no shaping terms — the critic's scale is unknown)."""

    points: float = 0.0   # points weight of the trained reward
    mono: float = 0.0     # PBRS monotonicity weight (potential term)
    empt: float = 0.0     # PBRS emptiness weight (potential term)
    sigma: float = 1.0    # RTG std — denormalizes the critic
    mu: float = 0.0       # RTG mean
    gamma: float = 0.99


def coefs_from_moments(moments, rtg_step, points: float, mono: float,
                       empt: float, gamma: float, rtg_beta: float) -> SearchCoefs:
    """SearchCoefs from LIVE streaming RTG moments — jit-traceable, so the
    expert-iteration rollout can denormalize the critic with the exact
    (bias-corrected) moments the learner normalizes with this step
    (algo/advantage.py::normalize_rtg)."""
    corr = jnp.maximum(1.0 - rtg_beta ** jnp.maximum(rtg_step, 1), 1e-8)
    mu_hat = moments.mu / corr
    sigma = jnp.sqrt(jnp.maximum(moments.m2 / corr - jnp.square(mu_hat), 1e-8))
    return SearchCoefs(points=points, mono=mono, empt=empt,
                       sigma=sigma, mu=mu_hat, gamma=gamma)


def potential(boards: jnp.ndarray, coefs: SearchCoefs) -> jnp.ndarray:
    """phi(s) of the trained PBRS shaping, over (..., 4, 4) boards."""
    phi = coefs.mono * H.monotonicity(boards).astype(jnp.float32)
    return phi + coefs.empt * H.emptiness(boards).astype(jnp.float32)


def expectimax_scores(apply_fn, params, boards: jnp.ndarray,
                      moves: engine.MoveSet | None = None,
                      coefs: SearchCoefs = SearchCoefs(),
                      depth: int = 1) -> jnp.ndarray:
    """(B, 4) action scores in trained-reward units (up to the action-
    independent ``-phi(boards)``); illegal actions are -inf.

    ``apply_fn(params, x(B,48)) -> (logits, value)`` — only the value head is
    consumed. Exact chance-node expectation: every legal 2048 move leaves at
    least one empty cell, so the spawn distribution is always well-defined.

    ``depth`` is the number of max-node plies. depth=1 values every live
    spawn child with the denormalized critic; depth=2 values it by ITS exact
    1-ply expectimax state value (4x32x4x32 leaves per board). Dead children
    contribute 0 — both the shaped reward's after-potential and the future
    return vanish at game over. The chance dimension of the depth-2 tree is
    evaluated with a sequential ``lax.map`` over the 32 spawn slots so peak
    memory stays at one 1-ply problem of size 4B.
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

    child_boards = cand.reshape(D * B * NUM_SPAWNS, 4, 4)
    if depth <= 1:
        # A spawn child with no legal move is game over: its future return is
        # exactly 0. The critic never trains on dead boards (they are never
        # model inputs), so its output there is unconstrained — without this
        # mask, 1-ply search walks into death traps on optimistic garbage.
        alive = engine.all_moves(child_boards).any_legal
        alive = alive.reshape(D * B, NUM_SPAWNS)
        _, values = apply_fn(params, encode_boards(child_boards))
        sv = coefs.sigma * values.reshape(D * B, NUM_SPAWNS) + coefs.mu
    else:
        # (D*B, 32, 4, 4) -> (32, D*B, 4, 4): one sequential sweep over the
        # chance dimension, each slot a batched (depth-1) subproblem over all
        # D*B children at once.
        child = jnp.moveaxis(cand.reshape(D * B, NUM_SPAWNS, 4, 4), 1, 0)
        sv, alive = jax.lax.map(
            lambda bs: state_values(apply_fn, params, bs, coefs, depth - 1),
            child)  # (32, D*B) each
        sv, alive = sv.T, alive.T  # (D*B, 32)

    # Immediate shaped after-potential (merged board, pre-spawn) + the
    # child's state value, both gated on the child being alive.
    phi_m = potential(merged.reshape(D * B, 4, 4), coefs)  # (D*B,)
    contrib = jnp.where(alive, phi_m[:, None] + sv, 0.0)  # (D*B, 32)
    ev = (weights.reshape(D * B, NUM_SPAWNS) * contrib).sum(-1).reshape(D, B)

    score = coefs.points * moves.scores.astype(jnp.float32) + coefs.gamma * ev
    score = jnp.where(moves.legal, score, -jnp.inf)
    return jnp.moveaxis(score, 0, -1)  # (B, 4)


def state_values(apply_fn, params, boards: jnp.ndarray,
                 coefs: SearchCoefs = SearchCoefs(),
                 depth: int = 1) -> tuple:
    """((B,), (B,) bool): exact shaped state value of each board by
    ``depth``-ply expectimax — ``max_a score(a) - phi(board)``, re-adding the
    constant ``expectimax_scores`` drops so values are comparable ACROSS
    boards — and the aliveness mask. Terminal boards are worth exactly 0
    (no legal action => the game is over, the future return is 0)."""
    moves = engine.all_moves(boards)
    s = expectimax_scores(apply_fn, params, boards, moves, coefs, depth)
    v = jnp.max(s, axis=-1) - potential(boards, coefs)
    return jnp.where(moves.any_legal, v, 0.0), moves.any_legal


@partial(jax.jit,
         static_argnames=("apply_fn", "num_envs", "max_steps", "depth"))
def search_rollout(apply_fn, params, num_envs: int, max_steps: int,
                   env_key: jax.Array,
                   coefs: SearchCoefs = SearchCoefs(), depth: int = 1):
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
                                   coefs, depth)
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
