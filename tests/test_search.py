"""Expectimax search eval (algo/search.py): exactness of the chance-node
expectation vs brute force, legality masking, and the end-to-end search
rollout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.algo import search as SRCH
from tpu2048.env import engine
from tpu2048.models import MLPConfig, mlp


@pytest.fixture(scope="module")
def model():
    cfg = MLPConfig(hidden_dim=32, num_layers=1)
    params = mlp.init(jax.random.key(5), cfg, zero_heads=False)
    return params, (lambda p, x: mlp.apply(p, cfg, x))


def _brute_force_scores(apply_fn, params, board, points_coef, value_coef):
    """Reference enumeration with plain Python loops."""
    from tpu2048.models.encoding import encode_boards

    moves = engine.all_moves(board[None])
    out = np.full(4, -np.inf)
    for d in range(4):
        if not bool(moves.legal[d, 0]):
            continue
        merged = np.asarray(moves.boards[d, 0])
        empties = [(r, c) for r in range(4) for c in range(4)
                   if merged[r, c] == 0]
        ev = 0.0
        for (r, c) in empties:
            for exp, pr in ((1, 0.9), (2, 0.1)):
                child = merged.copy()
                child[r, c] = exp
                _, v = apply_fn(params, encode_boards(jnp.asarray(child)[None]))
                ev += pr / len(empties) * float(v[0, 0])
        out[d] = points_coef * float(moves.scores[d, 0]) + value_coef * ev
    return out


def test_expectimax_matches_brute_force(model):
    params, apply_fn = model
    rng = np.random.default_rng(0)
    boards = jnp.asarray(rng.integers(0, 6, (5, 4, 4)), jnp.int32)
    got = np.asarray(
        SRCH.expectimax_scores(apply_fn, params, boards,
                               points_coef=0.1, value_coef=2.5))
    for i in range(boards.shape[0]):
        want = _brute_force_scores(apply_fn, params, boards[i], 0.1, 2.5)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_expectimax_masks_illegal(model):
    params, apply_fn = model
    # A board where LEFT is illegal (everything already flush left, no merges).
    board = jnp.asarray([[[1, 2, 3, 4],
                          [2, 3, 4, 5],
                          [3, 4, 5, 6],
                          [4, 5, 6, 7]]], jnp.int32)
    moves = engine.all_moves(board)
    scores = np.asarray(
        SRCH.expectimax_scores(apply_fn, params, board))
    legal = np.asarray(moves.legal)[:, 0]
    assert (scores[0, ~legal] == -np.inf).all()
    assert np.isfinite(scores[0, legal]).all()


def test_search_rollout_completes(model):
    params, apply_fn = model
    pts, final, nm = SRCH.search_rollout(
        apply_fn, params, 8, 300, jax.random.key(3))
    pts, nm = np.asarray(pts), np.asarray(nm)
    assert (pts >= 0).all() and (nm > 0).all()
    # Deterministic given the env stream.
    pts2, _, _ = SRCH.search_rollout(apply_fn, params, 8, 300, jax.random.key(3))
    np.testing.assert_array_equal(pts, np.asarray(pts2))


def _brute_force_depth2(apply_fn, params, board, points_coef, value_coef):
    """Exact 2-ply expectimax with plain Python loops: each spawn child is
    valued by its own best 1-ply score (0 if terminal)."""
    moves = engine.all_moves(board[None])
    out = np.full(4, -np.inf)
    for d in range(4):
        if not bool(moves.legal[d, 0]):
            continue
        merged = np.asarray(moves.boards[d, 0])
        empties = [(r, c) for r in range(4) for c in range(4)
                   if merged[r, c] == 0]
        ev = 0.0
        for (r, c) in empties:
            for exp, pr in ((1, 0.9), (2, 0.1)):
                child = merged.copy()
                child[r, c] = exp
                child_j = jnp.asarray(child, jnp.int32)
                child_moves = engine.all_moves(child_j[None])
                if not bool(child_moves.any_legal[0]):
                    v = 0.0  # terminal: game over, zero future return
                else:
                    v = float(np.max(_brute_force_scores(
                        apply_fn, params, child_j, points_coef, value_coef)))
                ev += pr / len(empties) * v
        out[d] = points_coef * float(moves.scores[d, 0]) + value_coef * ev
    return out


def test_expectimax_depth2_matches_brute_force(model):
    params, apply_fn = model
    rng = np.random.default_rng(7)
    boards = jnp.asarray(rng.integers(0, 6, (3, 4, 4)), jnp.int32)
    got = np.asarray(
        SRCH.expectimax_scores(apply_fn, params, boards,
                               points_coef=0.1, value_coef=2.5, depth=2))
    for i in range(boards.shape[0]):
        want = _brute_force_depth2(apply_fn, params, boards[i], 0.1, 2.5)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_search_rollout_depth2_completes(model):
    params, apply_fn = model
    pts, final, nm = SRCH.search_rollout(
        apply_fn, params, 4, 60, jax.random.key(3), depth=2)
    pts, nm = np.asarray(pts), np.asarray(nm)
    assert (pts >= 0).all() and (nm > 0).all()


def test_search_play_best_mirrors_search_rollout(model):
    """The recording host-loop player and the fused while_loop rollout share
    RNG structure, so per-game scores must agree exactly."""
    from tpu2048.models import MLPConfig
    from tpu2048.train import evaluate as EV

    params, apply_fn = model
    cfg = MLPConfig(hidden_dim=32, num_layers=1)
    pts, _, nm = SRCH.search_rollout(
        apply_fn, params, 6, 200, jax.random.key(99),
        points_coef=0.1, value_coef=2.0)
    ep = EV.search_play_best(params, cfg, "mlp", num_games=6, env_seed=99,
                             points_coef=0.1, value_coef=2.0, depth=1,
                             max_steps=200)
    assert ep["total_points"] == int(np.asarray(pts).max())
    best = int(np.asarray(pts).argmax())
    assert len(ep["moves"]) == int(np.asarray(nm)[best])
    # Replay consistency: every recorded transition is a legal engine step.
    first = ep["moves"][0]
    assert sum(v for row in first["state_before"] for v in row) >= 2
