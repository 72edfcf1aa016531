"""Drift guard for the browser game engine (web/js/game.js).

No JS runtime ships in this image (no node/bun/quickjs, no Chrome), so the
JS can't be executed directly (VERDICT r2, missing #3). Instead:

 1. A line-faithful Python transliteration of game.js's ``mergeRowLeft`` and
    ``simulate`` (including its get/set view indexers, which differ
    structurally from the oracle's transform-to-rows decomposition) is
    asserted against the Python oracle on random + crafted boards. The
    transliteration was hand-checked statement-by-statement against
    web/js/game.js and is pinned to it by content hash below.
 2. The hash pin makes the suite FAIL on any edit to web/js/game.js until
    the transliteration is re-synced — semantic drift in the JS cannot land
    silently.

Also covers the 48-dim ``modelFormatOf`` encoding vs models/encoding.py.
"""

import hashlib
from pathlib import Path

import numpy as np
import pytest

from tpu2048.env import oracle
from tests.conftest import random_board_np

GAME_JS = Path(__file__).resolve().parent.parent / "web" / "js" / "game.js"

# sha256 of the game.js revision the transliteration below mirrors.
# If this fails: re-read web/js/game.js, update the transliteration to match
# its NEW semantics, re-run this test, then update the hash.
GAME_JS_SHA256 = "bb019528da5bfcd6e9b1d5385bb8d9f8afb7412d4d2dfae392524a7ce4f4fca7"


def test_game_js_pinned_to_transliteration():
    digest = hashlib.sha256(GAME_JS.read_bytes()).hexdigest()
    assert digest == GAME_JS_SHA256, (
        "web/js/game.js changed — update the transliteration in this file "
        "to match, verify the tests below still pass, then bump "
        f"GAME_JS_SHA256 to {digest}"
    )


# ---- transliteration of web/js/game.js (same names, same control flow) ----

def merge_row_left_js(row):
    """Game2048.mergeRowLeft (game.js:44-60)."""
    vals = [v for v in row if v != 0]
    out, score = [], 0
    i = 0
    while i < len(vals):
        if i + 1 < len(vals) and vals[i] == vals[i + 1]:
            exp = vals[i] + 1
            out.append(exp)
            score += 1 << exp
            i += 1  # JS: i++ inside loop body, plus the for-loop's own i++
        else:
            out.append(vals[i])
        i += 1
    while len(out) < 4:
        out.append(0)
    return out, score


def simulate_js(grid, d):
    """Game2048.simulate (game.js:63-89): view indexers per direction."""
    if d == 2:
        get = lambda i, j: grid[i][j]
    elif d == 3:
        get = lambda i, j: grid[i][3 - j]
    elif d == 0:
        get = lambda i, j: grid[j][i]
    else:
        get = lambda i, j: grid[3 - j][i]

    def set_(out, i, j, v):
        if d == 2:
            out[i][j] = v
        elif d == 3:
            out[i][3 - j] = v
        elif d == 0:
            out[j][i] = v
        else:
            out[3 - j][i] = v

    out = [[0] * 4 for _ in range(4)]
    score = 0
    for i in range(4):
        line = [get(i, j) for j in range(4)]
        merged, s = merge_row_left_js(line)
        score += s
        for j in range(4):
            set_(out, i, j, merged[j])
    changed = any(out[r][c] != grid[r][c] for r in range(4) for c in range(4))
    return out, score, changed


def model_format_of_js(grid):
    """Game2048.modelFormatOf (game.js:131-141)."""
    out = []
    for r in range(4):
        for c in range(4):
            out += [float(grid[r][c]), r / 3, c / 3]
    return out


CRAFTED = [
    [[1, 1, 1, 1]] * 4,
    [[0] * 4] * 4,
    [[11, 11, 10, 10], [9, 9, 8, 8], [7, 7, 6, 6], [5, 5, 4, 4]],
    [[2, 2, 2, 0], [0, 3, 3, 3], [4, 0, 4, 4], [5, 5, 0, 5]],
    [[1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1]],
]


def _boards(rng, n=200):
    return [random_board_np(rng).tolist() for _ in range(n)] + CRAFTED


def test_js_simulate_matches_oracle(rng):
    for g in _boards(rng):
        for d in range(4):
            js_grid, js_score, js_changed = simulate_js(g, d)
            o_grid, o_score, _ = oracle.simulate_move(g, d)
            assert js_grid == o_grid, (g, d)
            assert js_score == o_score, (g, d)
            assert js_changed == oracle.direction_is_legal(g, d), (g, d)


def test_js_legal_dirs_and_score_match_oracle(rng):
    for g in _boards(rng):
        js_legal = [d for d in range(4) if simulate_js(g, d)[2]]
        assert js_legal == oracle.legal_directions(g), g
        js_score = sum(1 << v for row in g for v in row if v > 0)
        assert js_score == oracle.grid_score(g), g


def test_js_model_format_matches_encoding(rng):
    import jax.numpy as jnp

    from tpu2048.models.encoding import encode_boards

    for g in _boards(rng, n=32):
        ours = np.asarray(encode_boards(jnp.asarray([g], jnp.int32)))[0]
        np.testing.assert_allclose(model_format_of_js(g), ours, atol=1e-6)
