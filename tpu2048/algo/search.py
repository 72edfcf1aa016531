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


def _chance_ev(apply_fn, params, merged: jnp.ndarray, coefs: SearchCoefs,
               depth: int, prune_k: int) -> jnp.ndarray:
    """(M,) expected shaped child value of each merged (post-move, pre-spawn)
    board over the exact 32-way spawn distribution:

        E_spawn[ 1[child alive] * (phi(merged) + SV(child)) ]

    ``depth`` counts the REMAINING max-node plies below the chance node:
    0 values live children with the denormalized critic; >=1 values them by
    their own ``depth``-ply expectimax state value, evaluated with a
    sequential ``lax.map`` over the 32 spawn slots so peak memory stays at
    one ``depth``-ply problem of size M."""
    M = merged.shape[0]
    flat = merged.reshape(M, NUM_CELLS)
    empty = flat == 0  # (M, 16)
    n_empty = jnp.maximum(empty.sum(-1), 1)  # (M,)

    # Candidate children: set cell c to exponent e on each merged board.
    cell_hot = jnp.eye(NUM_CELLS, dtype=flat.dtype)  # (16, 16)
    cand = flat[:, None, None, :] + \
        cell_hot[None, :, None, :] * jnp.asarray([1, 2], flat.dtype)[None, None, :, None]
    # cand: (M, 16 cells, 2 exps, 16) — only valid where the cell was empty.
    weights = jnp.where(
        empty[:, :, None],
        jnp.asarray([0.9, 0.1])[None, None, :] / n_empty[:, None, None],
        0.0,
    )  # (M, 16, 2) sums to 1 over (cells, exps) for each merged board

    if depth <= 0:
        # A spawn child with no legal move is game over: its future return is
        # exactly 0. The critic never trains on dead boards (they are never
        # model inputs), so its output there is unconstrained — without this
        # mask, 1-ply search walks into death traps on optimistic garbage.
        child_boards = cand.reshape(M * NUM_SPAWNS, 4, 4)
        alive = engine.all_moves(child_boards).any_legal
        alive = alive.reshape(M, NUM_SPAWNS)
        _, values = apply_fn(params, encode_boards(child_boards))
        sv = coefs.sigma * values.reshape(M, NUM_SPAWNS) + coefs.mu
    else:
        # (M, 32, 4, 4) -> (32, M, 4, 4): one sequential sweep over the
        # chance dimension, each slot a batched subproblem over all M
        # children at once.
        child = jnp.moveaxis(cand.reshape(M, NUM_SPAWNS, 4, 4), 1, 0)
        sv, alive = jax.lax.map(
            lambda bs: state_values(apply_fn, params, bs, coefs, depth,
                                    prune_k),
            child)  # (32, M) each
        sv, alive = sv.T, alive.T  # (M, 32)

    # Immediate shaped after-potential (merged board, pre-spawn) + the
    # child's state value, both gated on the child being alive.
    phi_m = potential(merged, coefs)  # (M,)
    contrib = jnp.where(alive, phi_m[:, None] + sv, 0.0)  # (M, 32)
    return (weights.reshape(M, NUM_SPAWNS) * contrib).sum(-1)


def expectimax_scores(apply_fn, params, boards: jnp.ndarray,
                      moves: engine.MoveSet | None = None,
                      coefs: SearchCoefs = SearchCoefs(),
                      depth: int = 1, prune_k: int = 0) -> jnp.ndarray:
    """(B, 4) action scores in trained-reward units (up to the action-
    independent ``-phi(boards)``); illegal actions are -inf.

    ``apply_fn(params, x(B,48)) -> (logits, value)`` — only the value head is
    consumed. Exact chance-node expectation: every legal 2048 move leaves at
    least one empty cell, so the spawn distribution is always well-defined.

    ``depth`` is the number of max-node plies. depth=1 values every live
    spawn child with the denormalized critic; depth=2 values it by ITS exact
    1-ply expectimax state value (4x32x4x32 leaves per board); depth=d
    recurses d-1 more times. Dead children contribute 0 — both the shaped
    reward's after-potential and the future return vanish at game over.

    ``prune_k`` (0 = off) bounds the branching of the INNER max nodes: every
    recursive ``state_values`` call first scores its 4 actions with the
    cheap 1-ply search, then expands only the top-``prune_k`` of them at
    full remaining depth (the pruned value is the max over those deep
    scores). The exact tree grows (4*32)^(depth-1); with k=2 each inner max
    node halves its deep fan-out, which cuts depth-3 cost ~2x with a bias
    only when the 1-ply ranking misorders the true top action out of the
    top k. The ROOT scores returned here are never pruned — all 4 actions
    get full-depth values (the caller needs them all to pick a move).
    NOTE: inner max nodes only exist at depth >= 3 (at depth=2 the inner
    ``state_values`` calls run at depth 1, below the pruning gate), so
    ``prune_k`` has NO effect — neither speedup nor bias — for depth <= 2.
    """
    if moves is None:
        moves = engine.all_moves(boards)
    merged = moves.boards  # (4, B, 4, 4)
    D, B = merged.shape[0], merged.shape[1]

    ev = _chance_ev(apply_fn, params, merged.reshape(D * B, 4, 4), coefs,
                    depth - 1, prune_k).reshape(D, B)
    score = coefs.points * moves.scores.astype(jnp.float32) + coefs.gamma * ev
    score = jnp.where(moves.legal, score, -jnp.inf)
    return jnp.moveaxis(score, 0, -1)  # (B, 4)


def state_values(apply_fn, params, boards: jnp.ndarray,
                 coefs: SearchCoefs = SearchCoefs(),
                 depth: int = 1, prune_k: int = 0) -> tuple:
    """((B,), (B,) bool): exact shaped state value of each board by
    ``depth``-ply expectimax — ``max_a score(a) - phi(board)``, re-adding the
    constant ``expectimax_scores`` drops so values are comparable ACROSS
    boards — and the aliveness mask. Terminal boards are worth exactly 0
    (no legal action => the game is over, the future return is 0).

    ``prune_k`` in (1..3) with ``depth >= 2``: rank actions by the 1-ply
    search and expand only the top-k at full depth (see expectimax_scores).
    """
    moves = engine.all_moves(boards)
    B = boards.shape[0]
    if depth >= 2 and 0 < prune_k < 4:
        shallow = expectimax_scores(apply_fn, params, boards, moves, coefs, 1)
        _, top_idx = jax.lax.top_k(shallow, prune_k)  # (B, k)
        sel = top_idx.T  # (k, B)
        bidx = jnp.arange(B)[None, :]
        sel_merged = moves.boards[sel, bidx]  # (k, B, 4, 4)
        sel_pts = moves.scores[sel, bidx].astype(jnp.float32)  # (k, B)
        sel_legal = moves.legal[sel, bidx]  # (k, B)
        ev = _chance_ev(apply_fn, params,
                        sel_merged.reshape(prune_k * B, 4, 4), coefs,
                        depth - 1, prune_k).reshape(prune_k, B)
        s = coefs.points * sel_pts + coefs.gamma * ev
        s = jnp.where(sel_legal, s, -jnp.inf)  # (k, B)
        v = jnp.max(s, axis=0) - potential(boards, coefs)
    else:
        s = expectimax_scores(apply_fn, params, boards, moves, coefs, depth,
                              prune_k)
        v = jnp.max(s, axis=-1) - potential(boards, coefs)
    return jnp.where(moves.any_legal, v, 0.0), moves.any_legal


@partial(jax.jit,
         static_argnames=("apply_fn", "num_envs", "max_steps", "depth",
                          "prune_k"))
def search_rollout(apply_fn, params, num_envs: int, max_steps: int,
                   env_key: jax.Array,
                   coefs: SearchCoefs = SearchCoefs(), depth: int = 1,
                   prune_k: int = 0):
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
                                   coefs, depth, prune_k)
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
