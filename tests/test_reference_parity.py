"""Bit-exact parity vs the ACTUAL reference implementation.

BASELINE.md's north star: "2048 step-transition parity vs reference under
fixed seed — bit-exact". The reference tree is importable (torch + pydantic
are in the image), so these tests run the real ``game.py`` side by side with
our Python oracle on the SAME global-random stream: identical spawn sequences,
identical transitions, identical heuristic info dicts, over full games.

Since the JAX engine and heuristics are property-tested against the oracle
(tests/test_engine.py, tests/test_heuristics.py), parity is transitive:
reference == oracle == JAX engine.

Skipped when /root/reference is absent (public CI).
"""

import random
import sys
from pathlib import Path

import pytest

from tpu2048.env import oracle

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "game.py").exists(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_game():
    sys.path.insert(0, str(REFERENCE))
    import game as ref

    yield ref
    sys.path.remove(str(REFERENCE))


DIRS = ["up", "down", "left", "right"]  # oracle index -> reference enum value


def _ref_dir(ref, idx):
    return {d.value: d for d in ref.Direction}[DIRS[idx]]


def test_full_game_bit_exact(ref_game):
    """Play complete games with a shared action script: every spawn, board,
    reward, done flag and heuristic info field must match exactly."""
    ref = ref_game
    for seed in range(3):
        action_rng = random.Random(1000 + seed)

        random.seed(seed)
        g = ref.Game2048()
        g.reset()
        state_after_ref_reset = random.getstate()

        random.seed(seed)
        ours = oracle.reset()
        assert ours == g.grid, "reset spawn sequence diverged"
        assert random.getstate() == state_after_ref_reset

        for step_i in range(10_000):
            legal = oracle.legal_directions(ours)
            ref_legal = [
                i for i in range(4)
                if g.direction_has_step(_ref_dir(ref, i))
            ]
            assert legal == ref_legal, step_i
            if not legal:
                break
            a = action_rng.choice(legal)

            rng_before = random.getstate()
            ref_grid, ref_points, ref_done, ref_info = g.step(_ref_dir(ref, a))
            rng_after_ref = random.getstate()

            random.setstate(rng_before)
            ours, points, done, info = oracle.step(ours, a)
            assert random.getstate() == rng_after_ref, step_i

            assert ours == ref_grid, (seed, step_i)
            assert points == ref_points
            assert done == ref_done
            for k in (
                "invalid_move", "smoothness_delta", "max_tile_created",
                "corner_delta", "adjacency_delta", "chain_delta",
                "monotonicity_before", "monotonicity_after",
                "emptiness_before", "emptiness_after", "topological_delta",
            ):
                assert info[k] == pytest.approx(ref_info[k], abs=1e-9), (k, step_i)
            if done:
                break


def test_preview_rewards_bit_exact(ref_game):
    ref = ref_game
    random.seed(7)
    g = ref.Game2048()
    g.reset()
    grid = [row[:] for row in g.grid]
    for _ in range(50):
        legal = oracle.legal_directions(grid)
        if not legal:
            break
        ref_preview = g.preview_move_rewards()
        ours = oracle.preview_move_rewards(grid)
        assert ours == [ref_preview[_ref_dir(ref, i)] for i in range(4)]
        a = legal[0]
        grid, _, done, _ = oracle.step(grid, a)
        g.grid = [row[:] for row in grid]
        if done:
            break


def test_heuristics_bit_exact_random_boards(ref_game):
    """Heuristic suite vs the reference's static methods on random boards."""
    ref = ref_game
    import numpy as np

    rng = np.random.default_rng(3)
    for _ in range(100):
        b = rng.integers(0, 9, (4, 4))
        b = np.where(rng.random((4, 4)) < 0.35, 0, b)
        grid = [[int(v) for v in row] for row in b]
        G = ref.Game2048
        assert oracle.smoothness_score(grid) == G.smoothness_score(grid)
        assert oracle.corner_bonus(grid) == G.corner_bonus(grid)
        assert oracle.adjacency_bonus(grid) == pytest.approx(G.adjacency_bonus(grid))
        assert oracle.monotonic_chain_score(grid) == G.monotonic_chain_score(grid)
        assert oracle.monotonicity(grid) == G.monotonicity(grid)
        assert oracle.emptiness(grid) == G.emptiness(grid)
        anchor = G._choose_anchor_corner(grid)
        assert oracle.choose_anchor_corner(grid) == anchor
        assert oracle.topological_score(grid, anchor) == pytest.approx(
            G.topological_score(grid, anchor)
        )
        assert oracle.topological_score(grid, None) == pytest.approx(
            G.topological_score(grid, None)
        )


def test_encoding_bit_exact(ref_game):
    ref = ref_game
    import numpy as np
    import jax.numpy as jnp
    from tpu2048.models.encoding import encode_boards

    random.seed(11)
    g = ref.Game2048()
    g.reset()
    ref_enc = g.to_model_format().numpy()
    ours = np.asarray(encode_boards(jnp.asarray(g.grid, jnp.int32)[None]))[0]
    np.testing.assert_allclose(ours, ref_enc, atol=1e-7)
