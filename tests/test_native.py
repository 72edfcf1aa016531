"""Native C++ bitboard engine vs the Python oracle and the JAX engine."""

import numpy as np
import pytest

from tpu2048.env import oracle
from tests.conftest import random_board_np

native = pytest.importorskip("tpu2048.native")

try:
    native.load()
    HAVE_NATIVE = True
except Exception:  # toolchain missing
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="g++ unavailable")


def test_native_moves_match_oracle(rng):
    boards = np.stack([random_board_np(rng, max_exp=11) for _ in range(500)])
    for d in range(4):
        dirs = np.full(500, d, np.int32)
        out, scores, maxc, changed = native.move_batch(boards, dirs)
        for i in range(500):
            grid = [list(map(int, r)) for r in boards[i]]
            o_grid, o_score, o_max = oracle.simulate_move(grid, d)
            assert out[i].tolist() == o_grid, (i, d)
            assert scores[i] == o_score
            assert maxc[i] == o_max
            assert bool(changed[i]) == oracle.direction_is_legal(grid, d)


def test_native_legal_mask(rng):
    boards = np.stack([random_board_np(rng) for _ in range(300)])
    masks = native.legal_mask_batch(boards)
    for i in range(300):
        grid = [list(map(int, r)) for r in boards[i]]
        assert masks[i].tolist() == [oracle.direction_is_legal(grid, d) for d in range(4)]


def test_native_random_playout():
    out = native.random_playout(50, seed=7)
    assert (out["num_moves"] > 20).all()  # random games last a while
    assert (out["final_scores"] > 0).all()
    assert out["total_env_steps"] == out["num_moves"].sum()
    assert set(np.unique(out["max_tiles"])) <= {2**k for k in range(1, 13)}
    # Random play typically tops out between 16 and 256.
    assert np.median(out["max_tiles"]) >= 16


def test_native_vs_jax_engine_mass(rng):
    """Cross-check the JAX engine against the native engine on a large random
    batch (the native tier's raison d'être: cheap mass validation)."""
    import jax
    import jax.numpy as jnp
    from tpu2048.env import engine

    boards = np.stack([random_board_np(rng) for _ in range(2048)])
    ms = jax.jit(engine.all_moves)(jnp.asarray(boards))
    jb = np.asarray(ms.boards)
    js = np.asarray(ms.scores)
    jl = np.asarray(ms.legal)
    for d in range(4):
        out, scores, maxc, changed = native.move_batch(
            boards, np.full(len(boards), d, np.int32)
        )
        np.testing.assert_array_equal(out, jb[d])
        np.testing.assert_array_equal(scores, js[d])
        np.testing.assert_array_equal(changed, jl[d])
