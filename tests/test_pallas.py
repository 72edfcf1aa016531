"""Pallas merge kernel vs the XLA engine (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.env import engine
from tests.conftest import random_board_np


def test_pallas_all_moves_matches_engine(rng):
    from jax.experimental.pallas import tpu as pltpu
    from tpu2048.ops import pallas_merge

    boards = np.stack([random_board_np(rng) for _ in range(256)])
    jb = jnp.asarray(boards)
    ref = jax.jit(engine.all_moves)(jb)

    with pltpu.force_tpu_interpret_mode():
        ms = pallas_merge.all_moves(jb, block_n=128)

    np.testing.assert_array_equal(np.asarray(ms.boards), np.asarray(ref.boards))
    np.testing.assert_array_equal(np.asarray(ms.scores), np.asarray(ref.scores))
    np.testing.assert_array_equal(np.asarray(ms.legal), np.asarray(ref.legal))
    np.testing.assert_array_equal(
        np.asarray(ms.max_created), np.asarray(ref.max_created)
    )
