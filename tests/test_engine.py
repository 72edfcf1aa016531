"""Property tests: JAX engine vs the pure-Python oracle (SURVEY.md §4 strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.env import engine, oracle
from tests.conftest import random_board_np

DIRS = [oracle.UP, oracle.DOWN, oracle.LEFT, oracle.RIGHT]

# 2-vCPU CI: eager dispatch is ~8ms/primitive, so every engine call in tests
# goes through jit (one fused compile per shape).
J_MERGE = jax.jit(engine.merge_lines_left)
J_MOVES = jax.jit(engine.all_moves)
J_SPAWN = jax.jit(engine.spawn_tile)
J_RESET = jax.jit(engine.reset, static_argnums=1)
J_STEP = jax.jit(engine.step)


def _rand_boards(rng, n, **kw):
    return np.stack([random_board_np(rng, **kw) for _ in range(n)])


def test_merge_row_examples():
    """Hand-checked merge semantics (left-priority, single merge per tile)."""
    cases = [
        ([2, 2, 2, 0], [3, 2, 0, 0], 8, 3),
        ([2, 2, 2, 2], [3, 3, 0, 0], 16, 3),
        ([1, 1, 2, 2], [2, 3, 0, 0], 12, 3),
        ([2, 1, 1, 0], [2, 2, 0, 0], 4, 2),
        ([0, 0, 0, 1], [1, 0, 0, 0], 0, 0),
        ([0, 0, 0, 0], [0, 0, 0, 0], 0, 0),
        ([3, 0, 3, 1], [4, 1, 0, 0], 16, 4),
        ([5, 4, 3, 2], [5, 4, 3, 2], 0, 0),
    ]
    rows = jnp.asarray([c[0] for c in cases], dtype=jnp.int32)
    merged, score, maxc = J_MERGE(rows)
    for i, (row, exp_row, exp_score, exp_max) in enumerate(cases):
        o_row, o_score, o_max = oracle.merge_row_left(row)
        assert o_row == exp_row and o_score == exp_score and o_max == exp_max, i
        assert merged[i].tolist() == exp_row, (i, merged[i])
        assert int(score[i]) == exp_score
        assert int(maxc[i]) == exp_max


def test_merge_rows_random_vs_oracle(rng):
    rows = rng.integers(0, 6, size=(500, 4)).astype(np.int32)
    merged, score, maxc = J_MERGE(jnp.asarray(rows))
    merged, score, maxc = np.asarray(merged), np.asarray(score), np.asarray(maxc)
    for i in range(rows.shape[0]):
        o_row, o_score, o_max = oracle.merge_row_left(list(rows[i]))
        assert merged[i].tolist() == o_row
        assert int(score[i]) == o_score
        assert int(maxc[i]) == o_max


def test_all_moves_vs_oracle(rng):
    boards = _rand_boards(rng, 64)
    ms = J_MOVES(jnp.asarray(boards))
    mb, msc, mmc, mlg = (np.asarray(ms.boards), np.asarray(ms.scores),
                         np.asarray(ms.max_created), np.asarray(ms.legal))
    for i in range(boards.shape[0]):
        grid = [list(map(int, r)) for r in boards[i]]
        for d in DIRS:
            o_grid, o_score, o_max = oracle.simulate_move(grid, d)
            assert mb[d, i].tolist() == o_grid, (i, d)
            assert int(msc[d, i]) == o_score
            assert int(mmc[d, i]) == o_max
            assert bool(mlg[d, i]) == oracle.direction_is_legal(grid, d)


def test_action_mask_and_preview(rng):
    boards = _rand_boards(rng, 64)
    ms = J_MOVES(jnp.asarray(boards))
    mask = np.asarray(ms.action_mask)
    prev = np.asarray(ms.preview_rewards)
    anyl = np.asarray(ms.any_legal)
    for i in range(boards.shape[0]):
        grid = [list(map(int, r)) for r in boards[i]]
        assert mask[i].tolist() == [not oracle.direction_is_legal(grid, d) for d in DIRS]
        assert prev[i].tolist() == oracle.preview_move_rewards(grid)
        assert bool(anyl[i]) == oracle.has_next_step(grid)


def test_terminal_board_detection():
    # Checkerboard of alternating exponents: no move possible.
    dead = np.array([[1, 2, 1, 2], [2, 1, 2, 1], [1, 2, 1, 2], [2, 1, 2, 1]], np.int32)
    ms = J_MOVES(jnp.asarray(dead)[None])
    assert not bool(ms.any_legal[0])
    # One merge available.
    alive = dead.copy()
    alive[0, 0] = 2
    ms = J_MOVES(jnp.asarray(alive)[None])
    assert bool(ms.any_legal[0])


def test_spawn_distribution():
    key = jax.random.key(0)
    boards = jnp.zeros((4096, 4, 4), dtype=jnp.int32)
    spawned = J_SPAWN(boards, key)
    flat = np.asarray(spawned).reshape(4096, 16)
    counts = (flat > 0).sum(axis=1)
    assert (counts == 1).all()
    vals = flat.max(axis=1)
    frac_two = (vals == 1).mean()
    assert 0.87 < frac_two < 0.93  # 90% exponent-1 rule
    cells = flat.argmax(axis=1)
    # Uniform cell choice: each of 16 cells roughly 1/16.
    hist = np.bincount(cells, minlength=16) / 4096
    assert hist.min() > 0.03 and hist.max() < 0.10


def test_spawn_only_on_empty_cells(rng):
    boards = _rand_boards(rng, 64, p_zero=0.2)
    key = jax.random.key(1)
    spawned = np.asarray(J_SPAWN(jnp.asarray(boards), key))
    diff = spawned - boards
    changed = diff != 0
    assert (changed.sum(axis=(1, 2)) <= 1).all()
    # Spawned cell was empty before, gets exponent 1 or 2.
    for i in range(boards.shape[0]):
        if changed[i].any():
            r, c = np.argwhere(changed[i])[0]
            assert boards[i, r, c] == 0
            assert spawned[i, r, c] in (1, 2)
        else:
            assert (boards[i] != 0).all()  # full board -> unchanged


def test_full_board_spawn_noop():
    full = np.full((2, 4, 4), 3, np.int32)
    out = np.asarray(J_SPAWN(jnp.asarray(full), jax.random.key(2)))
    assert (out == full).all()


def test_reset():
    boards = np.asarray(J_RESET(jax.random.key(3), (256,)))
    nonzero = (boards > 0).sum(axis=(1, 2))
    assert (nonzero == 2).all()
    assert set(np.unique(boards)) <= {0, 1, 2}


def test_step_valid_and_invalid(rng):
    boards = _rand_boards(rng, 64)
    jb = jnp.asarray(boards)
    ms = J_MOVES(jb)
    actions = jnp.asarray(rng.integers(0, 4, size=64), dtype=jnp.int32)
    res = J_STEP(jb, actions, jax.random.key(4), moves=ms)
    out = np.asarray(res.board)
    r_inv, r_rew, r_max, r_done = (np.asarray(res.invalid), np.asarray(res.reward),
                                   np.asarray(res.max_created), np.asarray(res.done))
    actions = np.asarray(actions)
    for i in range(64):
        grid = [list(map(int, r)) for r in boards[i]]
        d = int(actions[i])
        if not oracle.direction_is_legal(grid, d):
            assert bool(r_inv[i])
            assert (out[i] == boards[i]).all()  # no move, no spawn
            assert int(r_rew[i]) == 0
        else:
            assert not bool(r_inv[i])
            o_grid, o_score, o_max = oracle.simulate_move(grid, d)
            assert int(r_rew[i]) == o_score
            assert int(r_max[i]) == o_max
            # Board = moved board + exactly one spawned tile on an empty cell.
            diff = out[i] - np.asarray(o_grid)
            changed = np.argwhere(diff != 0)
            assert len(changed) == 1
            r, c = changed[0]
            assert o_grid[r][c] == 0 and out[i, r, c] in (1, 2)
        # done flag matches terminality of the post-step board.
        assert bool(r_done[i]) == (not oracle.has_next_step([list(map(int, r)) for r in out[i]]))


def test_board_scores(rng):
    boards = _rand_boards(rng, 64)
    s = np.asarray(jax.jit(engine.board_scores)(jnp.asarray(boards)))
    for i in range(64):
        assert s[i] == oracle.grid_score([list(map(int, r)) for r in boards[i]])


def test_jit_and_vmap_compatible():
    f = jax.jit(lambda b: engine.all_moves(b).preview_rewards)
    b = engine.reset(jax.random.key(0), (8,))
    out = f(b)
    assert out.shape == (8, 4)
