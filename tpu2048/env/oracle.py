"""Pure-Python oracle for the 2048 game semantics used in parity tests.

This is a clean-room, dependency-free implementation of the game behavior
documented in SURVEY.md §2.1 (reference: game.py:45-1030). The JAX engine in
``tpu2048.env.engine`` is property-tested against this oracle over random
boards, and this oracle is itself unit-tested against hand-computed examples.

Boards are ``list[list[int]]`` of **exponents**: 0 = empty, k -> tile 2**k.
Direction indices follow the model-output convention 0=UP 1=DOWN 2=LEFT 3=RIGHT
(reference game.py:1087-1092).
"""

from __future__ import annotations

import random
from typing import Optional

GRID_SIZE = 4
UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3

Grid = list  # list[list[int]]


def empty_grid() -> Grid:
    return [[0] * GRID_SIZE for _ in range(GRID_SIZE)]


def copy_grid(grid: Grid) -> Grid:
    return [row[:] for row in grid]


def grid_score(grid: Grid) -> int:
    """Board-sum score: sum of tile values (reference game.py:63-64)."""
    return sum(2**k for row in grid for k in row if k > 0)


def max_exponent(grid: Grid) -> int:
    return max(max(row) for row in grid)


def merge_row_left(row: list) -> tuple:
    """Slide+merge one row leftward.

    Returns (new_row, score_gained, max_tile_created_exponent). Semantics per
    reference game.py:225-244: left-priority, each tile merges at most once,
    points = value (2**k) of every tile created.
    """
    vals = [v for v in row if v]
    out, score, max_created = [], 0, 0
    i = 0
    while i < len(vals):
        if i + 1 < len(vals) and vals[i] == vals[i + 1]:
            exp = vals[i] + 1
            out.append(exp)
            score += 2**exp
            max_created = max(max_created, exp)
            i += 2
        else:
            out.append(vals[i])
            i += 1
    out += [0] * (GRID_SIZE - len(out))
    return out, score, max_created


def _transform_to_rows(grid: Grid, direction: int) -> Grid:
    """View the grid so that the move becomes a leftward merge on each row."""
    if direction == LEFT:
        return copy_grid(grid)
    if direction == RIGHT:
        return [row[::-1] for row in grid]
    cols = [[grid[r][c] for r in range(GRID_SIZE)] for c in range(GRID_SIZE)]
    if direction == UP:
        return cols
    return [col[::-1] for col in cols]  # DOWN


def _transform_from_rows(rows: Grid, direction: int) -> Grid:
    if direction == LEFT:
        return rows
    if direction == RIGHT:
        return [row[::-1] for row in rows]
    if direction == DOWN:
        rows = [row[::-1] for row in rows]
    return [[rows[c][r] for c in range(GRID_SIZE)] for r in range(GRID_SIZE)]


def simulate_move(grid: Grid, direction: int) -> tuple:
    """(new_grid, score_gained, max_tile_created) without spawning.

    Mirrors reference game.py:121-160 (UP/DOWN via transpose, RIGHT via
    reversal, all reduced to the leftward row merge).
    """
    working = _transform_to_rows(grid, direction)
    merged = [merge_row_left(row) for row in working]
    new_grid = _transform_from_rows([m[0] for m in merged], direction)
    return new_grid, sum(m[1] for m in merged), max(m[2] for m in merged)


def direction_is_legal(grid: Grid, direction: int) -> bool:
    """A direction is legal iff the move changes the board.

    Equivalent to the reference's can_move OR can_merge decomposition
    (game.py:259-330): a slide is possible iff some zero precedes a nonzero in
    scan order, a merge iff an adjacent equal pair exists — in both cases, and
    only those cases, the merged board differs from the original.
    """
    new_grid, _, _ = simulate_move(grid, direction)
    return new_grid != grid


def legal_directions(grid: Grid) -> list:
    return [d for d in (UP, DOWN, LEFT, RIGHT) if direction_is_legal(grid, d)]


def has_next_step(grid: Grid) -> bool:
    return any(direction_is_legal(grid, d) for d in (UP, DOWN, LEFT, RIGHT))


def preview_move_rewards(grid: Grid) -> list:
    """Per-direction merge points; 0 for illegal moves (game.py:167-184)."""
    out = []
    for d in (UP, DOWN, LEFT, RIGHT):
        if not direction_is_legal(grid, d):
            out.append(0)
            continue
        _, score, _ = simulate_move(grid, d)
        out.append(score)
    return out


def spawn_tile(grid: Grid, rng: Optional[random.Random] = None) -> Grid:
    """Add a tile to a uniform-random empty cell: 90% exp 1, 10% exp 2.

    Mirrors reference game.py:923-940 (which uses the *global* Python RNG; we
    accept an explicit Random for determinism, defaulting to the global one to
    allow exact stream replication in parity harnesses).
    """
    r = rng if rng is not None else random
    empties = [(i, j) for i in range(GRID_SIZE) for j in range(GRID_SIZE) if grid[i][j] == 0]
    if not empties:
        return grid
    row, col = r.choice(empties)
    grid = copy_grid(grid)
    grid[row][col] = 1 if r.random() < 0.9 else 2
    return grid


def reset(rng: Optional[random.Random] = None) -> Grid:
    grid = spawn_tile(empty_grid(), rng)
    return spawn_tile(grid, rng)


# ---------------------------------------------------------------------------
# Heuristic suite (reference game.py:338-921). Used as the test oracle for the
# vectorized implementations in tpu2048.env.heuristics.
# ---------------------------------------------------------------------------

_CORNERS = ((0, 0), (0, GRID_SIZE - 1), (GRID_SIZE - 1, 0), (GRID_SIZE - 1, GRID_SIZE - 1))
_NEIGHBORS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def smoothness_score(grid: Grid) -> float:
    """-sum |exp diff| over adjacent non-empty pairs (game.py:338-357)."""
    s = 0.0
    for i in range(GRID_SIZE):
        for j in range(GRID_SIZE):
            if grid[i][j] == 0:
                continue
            if j + 1 < GRID_SIZE and grid[i][j + 1]:
                s -= abs(grid[i][j] - grid[i][j + 1])
            if i + 1 < GRID_SIZE and grid[i + 1][j]:
                s -= abs(grid[i][j] - grid[i + 1][j])
    return s


def corner_bonus(grid: Grid) -> float:
    """+max_exp if any max tile sits in a corner else -max_exp (game.py:359-399)."""
    m = max_exponent(grid)
    if m == 0:
        return 0.0
    in_corner = any(grid[r][c] == m for r, c in _CORNERS)
    return float(m) if in_corner else -float(m)


def adjacency_bonus(grid: Grid) -> float:
    """Neighbors-of-first-max bonus + adjacent high pairs (game.py:401-442)."""
    m, pos = 0, (0, 0)
    for i in range(GRID_SIZE):
        for j in range(GRID_SIZE):
            if grid[i][j] > m:
                m, pos = grid[i][j], (i, j)
    bonus = 0.0
    for di, dj in _NEIGHBORS:
        ni, nj = pos[0] + di, pos[1] + dj
        if 0 <= ni < GRID_SIZE and 0 <= nj < GRID_SIZE and grid[ni][nj] > 0:
            bonus += grid[ni][nj] * 0.5
    HIGH = 5
    for i in range(GRID_SIZE):
        for j in range(GRID_SIZE):
            if grid[i][j] >= HIGH:
                if j + 1 < GRID_SIZE and grid[i][j + 1] >= HIGH:
                    bonus += (grid[i][j] + grid[i][j + 1]) * 0.25
                if i + 1 < GRID_SIZE and grid[i + 1][j] >= HIGH:
                    bonus += (grid[i][j] + grid[i + 1][j]) * 0.25
    return bonus


def monotonic_chain_score(grid: Grid) -> float:
    """Sum of exponents along the best exactly-descending chain from a max tile.

    The reference implements this as a DFS with a visited set
    (game.py:444-506); because chain values strictly decrease by 1, no cell can
    repeat, so it reduces to a DP over descending exponent levels — the same
    reduction the vectorized engine uses.
    """
    m = max_exponent(grid)
    if m == 0:
        return 0.0
    # f[i][j] = best chain score starting at (i,j) descending by exactly 1.
    f = [[0.0] * GRID_SIZE for _ in range(GRID_SIZE)]
    for v in range(1, 17):
        for i in range(GRID_SIZE):
            for j in range(GRID_SIZE):
                if grid[i][j] != v:
                    continue
                best = 0.0
                for di, dj in _NEIGHBORS:
                    ni, nj = i + di, j + dj
                    if 0 <= ni < GRID_SIZE and 0 <= nj < GRID_SIZE and grid[ni][nj] == v - 1:
                        best = max(best, f[ni][nj])
                f[i][j] = v + best
    return max(f[i][j] for i in range(GRID_SIZE) for j in range(GRID_SIZE) if grid[i][j] == m)


def emptiness(grid: Grid) -> int:
    return sum(1 for row in grid for v in row if v == 0)


def rotate_cw(grid: Grid) -> Grid:
    """90 degrees clockwise (game.py:577-580)."""
    return [[grid[GRID_SIZE - 1 - j][i] for j in range(GRID_SIZE)] for i in range(GRID_SIZE)]


def mirror(grid: Grid, axis: str) -> Grid:
    """'horizontal' flips columns; 'vertical' flips rows (game.py:508-535)."""
    if axis == "horizontal":
        return [row[::-1] for row in grid]
    return [row[:] for row in grid[::-1]]


def monotonicity(grid: Grid) -> int:
    """Best ordered-pair count over 4 rotations, x2 / //2 by first-max-in-corner.

    Reference game.py:682-800: count adjacent pairs (both nonzero) with
    left>=right and top>=bottom over each rotation, take the best; then find
    the FIRST max tile in row-major scan order — double if it is in a corner,
    otherwise integer-halve.
    """
    best = -1
    cur = copy_grid(grid)
    for _ in range(4):
        n = 0
        for r in range(GRID_SIZE):
            for c in range(GRID_SIZE - 1):
                if cur[r][c] > 0 and cur[r][c + 1] > 0 and cur[r][c] >= cur[r][c + 1]:
                    n += 1
        for c in range(GRID_SIZE):
            for r in range(GRID_SIZE - 1):
                if cur[r][c] > 0 and cur[r + 1][c] > 0 and cur[r][c] >= cur[r + 1][c]:
                    n += 1
        best = max(best, n)
        cur = rotate_cw(cur)

    m = max_exponent(grid)
    first_max = None
    for r in range(GRID_SIZE):
        for c in range(GRID_SIZE):
            if grid[r][c] == m:
                first_max = (r, c)
                break
        if first_max:
            break
    return best * 2 if first_max in _CORNERS else best // 2


def snake_order(corner: tuple) -> list:
    """Boustrophedon path from a corner (game.py:610-632)."""
    cr, cc = corner
    row_dir = 1 if cr == 0 else -1
    col_dir = 1 if cc == 0 else -1
    order = []
    for i in range(GRID_SIZE):
        row = cr + i * row_dir
        cols = range(cc, cc + GRID_SIZE * col_dir, col_dir)
        if i % 2 == 1:
            cols = reversed(list(cols))
        for col in cols:
            if 0 <= col < GRID_SIZE:
                order.append((row, col))
    return order


def choose_anchor_corner(grid: Grid) -> tuple:
    """Corner holding a max tile, else corner nearest the first max (game.py:634-668)."""
    m = max_exponent(grid)
    maxes = [(i, j) for i in range(GRID_SIZE) for j in range(GRID_SIZE) if grid[i][j] == m and m > 0]
    if not maxes:
        return _CORNERS[0]
    for pos in maxes:
        if pos in _CORNERS:
            return pos
    t = maxes[0]
    return min(_CORNERS, key=lambda c: abs(c[0] - t[0]) + abs(c[1] - t[1]))


def topological_score(grid: Grid, anchor_corner: Optional[tuple] = None) -> float:
    """Snake-gradient organization score (game.py:802-921).

    Components per candidate corner: (1) position bonus (16-idx)*val*0.1;
    (2) monotonic bonus val*0.2 when non-increasing along the snake, inversion
    penalty (val-prev)*0.5 otherwise; (3) +2*max_val if the corner holds a max
    tile; (4) trapped-tile penalty -val for exp>=4 tiles late in the snake
    whose nonzero neighbors are mostly >=3 exponents lower.
    """
    tiles = [(grid[i][j], i, j) for i in range(GRID_SIZE) for j in range(GRID_SIZE) if grid[i][j] > 0]
    if not tiles:
        return 0.0
    max_val = max(t[0] for t in tiles)
    corners = [anchor_corner] if anchor_corner is not None else list(_CORNERS)

    best_score = float("-inf")
    for corner in corners:
        order = snake_order(corner)
        pos_to_idx = {pos: idx for idx, pos in enumerate(order)}
        score = 0.0
        for val, r, c in tiles:
            score += (16 - pos_to_idx[(r, c)]) * val * 0.1

        prev = float("inf")
        for r, c in order:
            val = grid[r][c]
            if val == 0:
                continue
            if val <= prev:
                score += val * 0.2
            else:
                score -= (val - prev) * 0.5
            prev = val

        if grid[corner[0]][corner[1]] == max_val:
            score += max_val * 2.0

        for val, r, c in tiles:
            if val < 4:
                continue
            lower = total = 0
            for di, dj in _NEIGHBORS:
                ni, nj = r + di, c + dj
                if 0 <= ni < GRID_SIZE and 0 <= nj < GRID_SIZE and grid[ni][nj] > 0:
                    total += 1
                    if grid[ni][nj] < val - 2:
                        lower += 1
            if total >= 2 and lower >= total - 1 and pos_to_idx[(r, c)] > 4:
                score -= val * 1.0

        best_score = max(best_score, score)
    return best_score


def step(grid: Grid, direction: int, rng: Optional[random.Random] = None) -> tuple:
    """Full RL step: (new_grid, points, done, info) per reference game.py:952-1030.

    Invalid move: unchanged board, 0 reward, zeroed heuristic info. Valid move:
    heuristics before the move and after the move **but before the spawn**,
    then spawn, then terminal check.
    """
    if not direction_is_legal(grid, direction):
        return (
            copy_grid(grid),
            0,
            not has_next_step(grid),
            {
                "invalid_move": True,
                "smoothness_delta": 0.0,
                "max_tile_created": 0,
                "corner_delta": 0.0,
                "adjacency_delta": 0.0,
                "chain_delta": 0.0,
                "monotonicity_before": 0.0,
                "monotonicity_after": 0.0,
                "topological_delta": 0.0,
                "emptiness_before": 0.0,
                "emptiness_after": 0.0,
            },
        )

    anchor = choose_anchor_corner(grid)
    before = {
        "smoothness": smoothness_score(grid),
        "corner": corner_bonus(grid),
        "adjacency": adjacency_bonus(grid),
        "chain": monotonic_chain_score(grid),
        "monotonicity": monotonicity(grid),
        "topological": topological_score(grid, anchor),
        "emptiness": emptiness(grid),
        "max_exp": max_exponent(grid),
    }
    new_grid, points, max_created = simulate_move(grid, direction)
    after = {
        "smoothness": smoothness_score(new_grid),
        "corner": corner_bonus(new_grid),
        "adjacency": adjacency_bonus(new_grid),
        "chain": monotonic_chain_score(new_grid),
        "monotonicity": monotonicity(new_grid),
        "topological": topological_score(new_grid, anchor),
        "emptiness": emptiness(new_grid),
        "max_exp": max_exponent(new_grid),
    }
    new_grid = spawn_tile(new_grid, rng)
    done = not has_next_step(new_grid)
    info = {
        "invalid_move": False,
        "smoothness_delta": after["smoothness"] - before["smoothness"],
        "max_tile_created": max_created,
        "max_exponent_before": before["max_exp"],
        "max_exponent_after": after["max_exp"],
        "corner_delta": after["corner"] - before["corner"],
        "adjacency_delta": after["adjacency"] - before["adjacency"],
        "chain_delta": after["chain"] - before["chain"],
        "monotonicity_before": before["monotonicity"],
        "monotonicity_after": after["monotonicity"],
        "emptiness_before": before["emptiness"],
        "emptiness_after": after["emptiness"],
        "topological_delta": after["topological"] - before["topological"],
        "topological_anchor": anchor,
    }
    return new_grid, points, done, info
