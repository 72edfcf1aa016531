"""Board symmetry transforms and the matching action-space remaps.

Used by the data-augmentation stage (reference train.py:774-881): a mirrored or
rotated board is a valid training sample provided the taken action, the action
mask and the behavior-policy logprobs are permuted consistently.

Transform ids (TRANSFORMS):
  0: identity          4: rotate 90 CW
  1: mirror horizontal 5: rotate 180
  2: mirror vertical   6: rotate 270 CW
(The reference never composes mirror+rotate into one sample — it emits separate
mirrored and rotated copies — so single transforms suffice.)

Direction indices 0=UP 1=DOWN 2=LEFT 3=RIGHT.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

IDENTITY, MIRROR_H, MIRROR_V, ROT90, ROT180, ROT270 = 0, 1, 2, 3, 4, 5
NUM_TRANSFORMS = 6

# action_new = ACTION_MAP[transform, action_old]
# mirror horizontal swaps LEFT/RIGHT (train.py:784-793); mirror vertical swaps
# UP/DOWN; rot90 CW maps UP->RIGHT, RIGHT->DOWN, DOWN->LEFT, LEFT->UP
# (train.py:795-808).
_R90 = np.array([3, 2, 0, 1], dtype=np.int32)  # old dir -> new dir
ACTION_MAP = np.stack(
    [
        np.array([0, 1, 2, 3], dtype=np.int32),
        np.array([0, 1, 3, 2], dtype=np.int32),  # mirror h: L<->R
        np.array([1, 0, 2, 3], dtype=np.int32),  # mirror v: U<->D
        _R90,
        _R90[_R90],
        _R90[_R90][_R90],
    ]
)
# PERM[t, j] = old index whose value lands at new index j (the scatter
# new[ACTION_MAP[t, i]] = old[i] as a gather), for permuting masks/logprobs
# (train.py:810-824).
PERM = np.empty_like(ACTION_MAP)
for _t in range(NUM_TRANSFORMS):
    PERM[_t, ACTION_MAP[_t]] = np.arange(4)

# CELL_PERM[t, j] = flat old cell index whose value lands at flat new cell j.
# Built by pushing the index board through each transform once at import time;
# a per-board transform is then ONE 16-wide take_along_axis instead of
# materializing all 6 transformed variants and selecting (the variant stack
# measured ~14 ms per call at the HT config's 262k augmented rows — it was
# the single largest op in the train step).
_I = np.arange(16, dtype=np.int32).reshape(4, 4)
CELL_PERM = np.stack([
    _I,
    _I[:, ::-1],
    _I[::-1, :],
    np.rot90(_I, k=-1),
    np.rot90(_I, k=2),
    np.rot90(_I, k=1),
]).reshape(NUM_TRANSFORMS, 16)


def transform_board(boards: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-board symmetry transform.

    boards: (...B, 4, 4); transform: (...B,) int in [0, 6). Board conventions
    match the reference: mirror 'horizontal' flips columns, 'vertical' flips
    rows (game.py:508-535); rotations are clockwise (game.py:537-590).
    """
    flat = boards.reshape(boards.shape[:-2] + (16,))
    perm = jnp.asarray(CELL_PERM)[transform]  # (...B, 16)
    out = jnp.take_along_axis(flat, perm.astype(jnp.int32), axis=-1)
    return out.reshape(boards.shape)


def transform_action(action: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Remap taken-action indices under a per-sample transform."""
    return jnp.asarray(ACTION_MAP)[transform, action]


def transform_action_vector(vec: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Permute a per-action vector (mask (...B,4) or logprobs (...B,4)) so that
    entry for direction d moves to the transformed direction."""
    perm = jnp.asarray(PERM)[transform]  # (...B, 4)
    return jnp.take_along_axis(vec, perm, axis=-1)
