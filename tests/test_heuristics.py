"""Vectorized heuristics vs the Python oracle (reference game.py:338-921)."""

import numpy as np
import jax.numpy as jnp

from tpu2048.env import heuristics as H
from tpu2048.env import oracle
from tests.conftest import random_board_np
import jax

J = {name: jax.jit(getattr(H, name)) for name in [
    "smoothness", "corner_bonus", "adjacency_bonus", "monotonic_chain_score",
    "emptiness", "monotonicity", "choose_anchor_corner",
]}
J_TOPO = jax.jit(H.topological_score)
J_TOPO_NONE = jax.jit(lambda b: H.topological_score(b, None))
J_SUITE = jax.jit(H.full_suite)


def _grids(rng, n, **kw):
    boards = np.stack([random_board_np(rng, **kw) for _ in range(n)])
    grids = [[list(map(int, r)) for r in b] for b in boards]
    return boards, grids


CORNERS = [(0, 0), (0, 3), (3, 0), (3, 3)]


def test_smoothness(rng):
    boards, grids = _grids(rng, 64)
    out = np.asarray(J['smoothness'](jnp.asarray(boards)))
    for i, g in enumerate(grids):
        assert out[i] == oracle.smoothness_score(g)


def test_corner_bonus(rng):
    boards, grids = _grids(rng, 64)
    boards[0] = 0  # empty-board edge case
    grids[0] = [[0] * 4 for _ in range(4)]
    out = np.asarray(J['corner_bonus'](jnp.asarray(boards)))
    for i, g in enumerate(grids):
        assert out[i] == oracle.corner_bonus(g)


def test_adjacency_bonus(rng):
    boards, grids = _grids(rng, 64)
    out = np.asarray(J['adjacency_bonus'](jnp.asarray(boards)))
    for i, g in enumerate(grids):
        assert abs(out[i] - oracle.adjacency_bonus(g)) < 1e-5, (i, g)


def test_chain_score(rng):
    boards, grids = _grids(rng, 64, max_exp=6, p_zero=0.3)
    out = np.asarray(J['monotonic_chain_score'](jnp.asarray(boards)))
    for i, g in enumerate(grids):
        assert out[i] == oracle.monotonic_chain_score(g), (i, g)


def test_chain_score_known():
    # Snake 5->4->3->2 plus a dead-end 4: best chain 5+4+3+2=14.
    g = [[5, 4, 0, 0], [0, 3, 0, 0], [0, 2, 0, 0], [4, 0, 0, 0]]
    assert oracle.monotonic_chain_score(g) == 14.0
    out = np.asarray(J['monotonic_chain_score'](jnp.asarray(g, dtype=jnp.int32)[None]))
    assert out[0] == 14.0


def test_emptiness(rng):
    boards, grids = _grids(rng, 64)
    out = np.asarray(J['emptiness'](jnp.asarray(boards)))
    for i, g in enumerate(grids):
        assert out[i] == oracle.emptiness(g)


def test_monotonicity(rng):
    boards, grids = _grids(rng, 64)
    out = np.asarray(J['monotonicity'](jnp.asarray(boards)))
    for i, g in enumerate(grids):
        assert out[i] == oracle.monotonicity(g), (i, g)


def test_anchor_corner(rng):
    boards, grids = _grids(rng, 64)
    out = np.asarray(J['choose_anchor_corner'](jnp.asarray(boards)))
    for i, g in enumerate(grids):
        assert CORNERS[out[i]] == oracle.choose_anchor_corner(g), (i, g)


def test_topological(rng):
    boards, grids = _grids(rng, 64)
    anchor = np.asarray(J['choose_anchor_corner'](jnp.asarray(boards)))
    out = np.asarray(J_TOPO(jnp.asarray(boards), jnp.asarray(anchor)))
    for i, g in enumerate(grids):
        a = oracle.choose_anchor_corner(g)
        expect = oracle.topological_score(g, a)
        assert abs(out[i] - expect) < 1e-4, (i, g)


def test_topological_no_anchor(rng):
    boards, grids = _grids(rng, 16)
    out = np.asarray(J_TOPO_NONE(jnp.asarray(boards)))
    for i, g in enumerate(grids):
        assert abs(out[i] - oracle.topological_score(g, None)) < 1e-4, (i, g)


def test_snake_orders_match_oracle():
    for ci, corner in enumerate(CORNERS):
        order = oracle.snake_order(corner)
        flat = [r * 4 + c for r, c in order]
        assert H._SNAKE_ORDER[ci].tolist() == flat
        assert sorted(flat) == list(range(16))


def test_full_suite_shapes(rng):
    boards, _ = _grids(rng, 8)
    out = J_SUITE(jnp.asarray(boards))
    for k, v in out.items():
        assert v.shape == (8,), k
