"""Vectorized heuristic suite (reward shaping + logging signals).

Array-program re-implementations of the reference's per-board Python loops
(reference game.py:338-921), operating on batches of ``(...B, 4, 4)`` int32
exponent boards. All are pure, jit-safe, fixed-shape.

Only ``monotonicity`` and ``emptiness`` feed the live PBRS reward
(reference train.py:698-719); the rest are logging/visualization signals, so
the rollout computes them at reduced cadence (or on the selected best episode
only). The DFS of ``monotonic_chain_score`` (game.py:476-506) is re-derived as
a 16-level dynamic program — chain values strictly descend by one, so the DFS's
visited-set can never trigger and the recursion collapses to a DP.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import oracle

GRID_SIZE = 4
NUM_CELLS = 16

# Corner flat indices in row-major scan order: (0,0) (0,3) (3,0) (3,3).
_CORNER_FLAT = np.array([0, 3, 12, 15], dtype=np.int32)
_CORNER_COORDS = np.array([[0, 0], [0, 3], [3, 0], [3, 3]], dtype=np.int32)

# Snake orders per corner, and the inverse permutation (cell -> snake index),
# generated from the oracle's reference-faithful generator (game.py:610-632).
_SNAKE_ORDER = np.zeros((4, NUM_CELLS), dtype=np.int32)
_SNAKE_INDEX = np.zeros((4, NUM_CELLS), dtype=np.int32)
for _ci, (_r, _c) in enumerate(_CORNER_COORDS):
    _order = oracle.snake_order((int(_r), int(_c)))
    for _k, (_rr, _cc) in enumerate(_order):
        _SNAKE_ORDER[_ci, _k] = _rr * GRID_SIZE + _cc
        _SNAKE_INDEX[_ci, _rr * GRID_SIZE + _cc] = _k

_NEIGHBOR_SHIFTS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _neighbor(boards: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """Value of the (di,dj)-neighbor per cell, 0 outside the board."""
    padded = jnp.pad(boards, [(0, 0)] * (boards.ndim - 2) + [(1, 1), (1, 1)])
    return padded[..., 1 + di : 1 + di + GRID_SIZE, 1 + dj : 1 + dj + GRID_SIZE]


def smoothness(boards: jnp.ndarray) -> jnp.ndarray:
    """-sum of |exponent diff| over adjacent non-empty pairs (game.py:338-357)."""
    b = boards
    h_l, h_r = b[..., :, :-1], b[..., :, 1:]
    v_t, v_b = b[..., :-1, :], b[..., 1:, :]
    h = jnp.where((h_l > 0) & (h_r > 0), jnp.abs(h_l - h_r), 0)
    v = jnp.where((v_t > 0) & (v_b > 0), jnp.abs(v_t - v_b), 0)
    return -(jnp.sum(h, axis=(-1, -2)) + jnp.sum(v, axis=(-1, -2))).astype(jnp.float32)


def corner_bonus(boards: jnp.ndarray) -> jnp.ndarray:
    """+max_exp if any max tile is in a corner, else -max_exp; 0 for empty
    boards (game.py:359-399)."""
    flat = boards.reshape(boards.shape[:-2] + (NUM_CELLS,))
    m = jnp.max(flat, axis=-1)
    corners = flat[..., _CORNER_FLAT]
    in_corner = jnp.any(corners == m[..., None], axis=-1)
    out = jnp.where(in_corner, m, -m).astype(jnp.float32)
    return jnp.where(m > 0, out, 0.0)


def _first_max_onehot(flat: jnp.ndarray) -> tuple:
    """One-hot of the first (row-major) max cell, plus the max value."""
    m = jnp.max(flat, axis=-1)
    idx = jnp.argmax(flat, axis=-1)  # argmax returns the first occurrence
    onehot = jnp.arange(NUM_CELLS) == idx[..., None]
    return onehot, m, idx


def adjacency_bonus(boards: jnp.ndarray) -> jnp.ndarray:
    """Neighbors-of-the-first-max bonus + adjacent >=32 pairs (game.py:401-442)."""
    flat = boards.reshape(boards.shape[:-2] + (NUM_CELLS,))
    onehot, _, _ = _first_max_onehot(flat)
    onehot_grid = onehot.reshape(boards.shape).astype(jnp.float32)

    nb_sum = jnp.zeros(boards.shape[:-2], dtype=jnp.float32)
    for di, dj in _NEIGHBOR_SHIFTS:
        nb = _neighbor(boards, di, dj).astype(jnp.float32)
        nb_sum = nb_sum + jnp.sum(onehot_grid * nb * 0.5, axis=(-1, -2))

    HIGH = 5
    b = boards
    h_l, h_r = b[..., :, :-1], b[..., :, 1:]
    v_t, v_b = b[..., :-1, :], b[..., 1:, :]
    h = jnp.where((h_l >= HIGH) & (h_r >= HIGH), (h_l + h_r) * 0.25, 0.0)
    v = jnp.where((v_t >= HIGH) & (v_b >= HIGH), (v_t + v_b) * 0.25, 0.0)
    return nb_sum + jnp.sum(h, axis=(-1, -2)) + jnp.sum(v, axis=(-1, -2))


def monotonic_chain_score(boards: jnp.ndarray) -> jnp.ndarray:
    """Best exactly-descending chain score from any max tile (game.py:444-506).

    DP over exponent levels v=1..16: f(cell)=v + max over neighbors holding
    v-1 of f(neighbor). The answer is f at any max cell (all max cells tie for
    the start)."""
    f = jnp.zeros(boards.shape, dtype=jnp.float32)
    for v in range(1, 17):
        best_nb = jnp.zeros(boards.shape, dtype=jnp.float32)
        for di, dj in _NEIGHBOR_SHIFTS:
            nb_val = _neighbor(boards, di, dj)
            nb_f = _neighbor(f, di, dj)
            best_nb = jnp.maximum(best_nb, jnp.where(nb_val == v - 1, nb_f, 0.0))
        f = jnp.where(boards == v, v + best_nb, f)
    m = jnp.max(boards, axis=(-1, -2))
    at_max = jnp.where(boards == m[..., None, None], f, 0.0)
    out = jnp.max(at_max, axis=(-1, -2))
    return jnp.where(m > 0, out, 0.0)


def emptiness(boards: jnp.ndarray) -> jnp.ndarray:
    """Number of empty cells (game.py:670-680)."""
    return jnp.sum((boards == 0).astype(jnp.int32), axis=(-1, -2))


def _pair_count(b: jnp.ndarray) -> jnp.ndarray:
    """Ordered adjacent pairs: left>=right plus top>=bottom, both nonzero."""
    h_l, h_r = b[..., :, :-1], b[..., :, 1:]
    v_t, v_b = b[..., :-1, :], b[..., 1:, :]
    h = ((h_l > 0) & (h_r > 0) & (h_l >= h_r)).astype(jnp.int32)
    v = ((v_t > 0) & (v_b > 0) & (v_t >= v_b)).astype(jnp.int32)
    return jnp.sum(h, axis=(-1, -2)) + jnp.sum(v, axis=(-1, -2))


def monotonicity(boards: jnp.ndarray) -> jnp.ndarray:
    """Best pair count over 4 rotations, then x2 if the FIRST max tile (row-
    major scan) is in a corner else //2 (game.py:682-800, incl. its
    first-max-position quirk)."""
    best = _pair_count(boards)
    b = boards
    for _ in range(3):
        b = jnp.rot90(b, k=-1, axes=(-2, -1))
        best = jnp.maximum(best, _pair_count(b))
    flat = boards.reshape(boards.shape[:-2] + (NUM_CELLS,))
    _, _, idx = _first_max_onehot(flat)
    in_corner = jnp.any(idx[..., None] == jnp.asarray(_CORNER_FLAT), axis=-1)
    return jnp.where(in_corner, best * 2, best // 2)


def choose_anchor_corner(boards: jnp.ndarray) -> jnp.ndarray:
    """Anchor corner index (0..3 into scan-order corners) per board
    (game.py:634-668): the first corner holding a max tile, else the corner
    nearest (Manhattan) to the first max tile, ties to the lower index."""
    flat = boards.reshape(boards.shape[:-2] + (NUM_CELLS,))
    m = jnp.max(flat, axis=-1)
    corners = flat[..., _CORNER_FLAT]
    corner_has_max = (corners == m[..., None]) & (m[..., None] > 0)
    first_corner = jnp.argmax(corner_has_max, axis=-1)
    any_corner = jnp.any(corner_has_max, axis=-1)

    idx = jnp.argmax(flat, axis=-1)
    r0, c0 = idx // GRID_SIZE, idx % GRID_SIZE
    cr = jnp.asarray(_CORNER_COORDS[:, 0])
    cc = jnp.asarray(_CORNER_COORDS[:, 1])
    dist = jnp.abs(cr - r0[..., None]) + jnp.abs(cc - c0[..., None])
    nearest = jnp.argmin(dist, axis=-1)  # first minimum on ties
    return jnp.where(any_corner, first_corner, nearest).astype(jnp.int32)


def topological_score(boards: jnp.ndarray, anchor: jnp.ndarray | None = None) -> jnp.ndarray:
    """Snake-gradient organization score (game.py:802-921).

    ``anchor``: (...B,) corner index per board; if None, the max over all four
    corners is returned (the reference's no-anchor path)."""
    if anchor is None:
        scores = [
            topological_score(boards, jnp.full(boards.shape[:-2], ci, dtype=jnp.int32))
            for ci in range(4)
        ]
        return jnp.max(jnp.stack(scores), axis=0)

    flat = boards.reshape(boards.shape[:-2] + (NUM_CELLS,)).astype(jnp.float32)
    nonzero = flat > 0
    m = jnp.max(flat, axis=-1)

    snake_index = jnp.asarray(_SNAKE_INDEX)[anchor]  # (...B, 16) cell -> pos
    snake_order = jnp.asarray(_SNAKE_ORDER)[anchor]  # (...B, 16) pos -> cell

    # 1. Position bonus: (16 - snake_idx) * val * 0.1 over nonzero cells.
    score = jnp.sum((16.0 - snake_index) * flat * 0.1 * nonzero, axis=-1)

    # 2. Monotonic bonus / inversion penalty along the snake, skipping zeros.
    along = jnp.take_along_axis(flat, snake_order, axis=-1)  # (...B, 16)
    prev = jnp.full(boards.shape[:-2], jnp.inf, dtype=jnp.float32)
    for k in range(NUM_CELLS):
        val = along[..., k]
        present = val > 0
        inc = jnp.where(val <= prev, val * 0.2, -(val - prev) * 0.5)
        score = score + jnp.where(present, inc, 0.0)
        prev = jnp.where(present, val, prev)

    # 3. Max tile anchored in the chosen corner.
    corner_cell = jnp.asarray(_CORNER_FLAT)[anchor]
    corner_val = jnp.take_along_axis(
        flat, corner_cell[..., None], axis=-1
    )[..., 0]
    score = score + jnp.where((corner_val == m) & (m > 0), m * 2.0, 0.0)

    # 4. Trapped-tile penalty for exp>=4 tiles late in the snake.
    b = boards
    total = jnp.zeros(boards.shape, dtype=jnp.int32)
    lower = jnp.zeros(boards.shape, dtype=jnp.int32)
    for di, dj in _NEIGHBOR_SHIFTS:
        nb = _neighbor(b, di, dj)
        total = total + (nb > 0)
        lower = lower + ((nb > 0) & (nb < b - 2))
    snake_idx_grid = snake_index.reshape(boards.shape)
    trapped = (b >= 4) & (total >= 2) & (lower >= total - 1) & (snake_idx_grid > 4)
    score = score - jnp.sum(jnp.where(trapped, b, 0).astype(jnp.float32), axis=(-1, -2))

    # Empty board: reference returns 0.0 before any corner loop.
    return jnp.where(m > 0, score, 0.0)


def live_potentials(boards: jnp.ndarray) -> tuple:
    """(monotonicity, emptiness) — the two PBRS potentials that feed the live
    reward (reference train.py:709-714)."""
    return monotonicity(boards), emptiness(boards)


def full_suite(boards: jnp.ndarray, anchor: jnp.ndarray | None = None) -> dict:
    """All heuristics at once (used at logging cadence / parity tests)."""
    if anchor is None:
        anchor = choose_anchor_corner(boards)
    return {
        "smoothness": smoothness(boards),
        "corner": corner_bonus(boards),
        "adjacency": adjacency_bonus(boards),
        "chain": monotonic_chain_score(boards),
        "monotonicity": monotonicity(boards).astype(jnp.float32),
        "emptiness": emptiness(boards).astype(jnp.float32),
        "topological": topological_score(boards, anchor),
    }
