"""Board -> model-input encoding.

The reference feeds a flat 48-vector: per cell, (raw exponent, row/3, col/3)
interleaved in row-major order (reference game.py:92-101). Exponents are NOT
normalized; only the positional indices are scaled into [0, 1].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

GRID_SIZE = 4
NUM_CELLS = 16
INPUT_DIM = NUM_CELLS * 3

_ROW_IDX = (np.arange(NUM_CELLS) // GRID_SIZE) / 3.0
_COL_IDX = (np.arange(NUM_CELLS) % GRID_SIZE) / 3.0


def encode_boards(boards: jnp.ndarray) -> jnp.ndarray:
    """(...B, 4, 4) int -> (...B, 48) float32 model input."""
    batch_shape = boards.shape[:-2]
    flat = boards.reshape(batch_shape + (NUM_CELLS,)).astype(jnp.float32)
    rows = jnp.broadcast_to(jnp.asarray(_ROW_IDX, dtype=jnp.float32), flat.shape)
    cols = jnp.broadcast_to(jnp.asarray(_COL_IDX, dtype=jnp.float32), flat.shape)
    stacked = jnp.stack([flat, rows, cols], axis=-1)  # (...B, 16, 3)
    return stacked.reshape(batch_shape + (INPUT_DIM,))
