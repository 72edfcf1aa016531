"""Pallas TPU kernel: fused 4-direction slide+merge for batches of boards.

The XLA elementwise formulation in ``env/engine.py`` is already extremely fast
(the merge is ~0.2ns/board on a v5e); this kernel exists as the hand-scheduled
alternative for the hot op, laid out the way the hardware wants it:

 * boards live CELL-MAJOR: a ``(16, N)`` int32 block — 16 sublanes x N lanes,
   a perfect VPU tile for N >= 128, instead of the (N, 4, 4) layout whose tiny
   trailing dims pad to (8, 128) tiles;
 * the per-row compress/merge sweeps become full-block selects with
   statically-masked neighbor shifts (pltpu.roll along the sublane axis), so
   every VPU op works on all 16 cells of every board at once;
 * the four directions are handled OUTSIDE the kernel: XLA pre-gathers each
   direction's cell permutation (transpose/reverse become row permutations of
   the 16 sublanes), the grid iterates (direction, batch-tile), and the kernel
   body is the pure merge-left sweep. Round 1 put the 4x16 single-sublane
   permutation concats inside the kernel and Mosaic's v5e compile hung >10 min
   (ROADMAP round 1); with the gathers hoisted the body is roll/select-only.

Outputs per direction d (0=UP 1=DOWN 2=LEFT 3=RIGHT): merged boards, merge
scores, legality (board changed). Matches engine.all_moves bit-for-bit (see
tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_CELLS = 16
BLOCK_N = 512  # boards per grid step; lanes dimension

# Cell-index permutations mapping each direction's merge to a "merge the flat
# cells leftward within each 4-group" problem. perm[d][k] = source flat cell
# feeding working position k. Working position k belongs to line k//4, slot
# k%4 (slots merge toward slot 0).
_PERMS = np.zeros((4, NUM_CELLS), dtype=np.int32)
for _d in range(4):
    for _line in range(4):
        for _slot in range(4):
            if _d == 2:  # LEFT: lines are rows, slot 0 = col 0
                r, c = _line, _slot
            elif _d == 3:  # RIGHT: reversed rows
                r, c = _line, 3 - _slot
            elif _d == 0:  # UP: lines are columns, slot 0 = row 0
                r, c = _slot, _line
            else:  # DOWN: reversed columns
                r, c = 3 - _slot, _line
            _PERMS[_d, _line * 4 + _slot] = r * 4 + c
_INV_PERMS = np.zeros_like(_PERMS)
for _d in range(4):
    _INV_PERMS[_d, _PERMS[_d]] = np.arange(NUM_CELLS)

# Static sublane masks: working position k may look at its right neighbor
# (k+1) only within the same 4-group.
_HAS_NEXT = ((np.arange(NUM_CELLS) % 4) < 3)


def _merge_left_block(x):
    """Merge each 4-group of the 16 sublanes leftward. x: (16, N) int32.
    Returns (merged (16, N), score (1, N), max_created (1, N))."""
    # Built from iota so the kernel captures no external constants.
    has_next = (jax.lax.broadcasted_iota(jnp.int32, (NUM_CELLS, 1), 0) % 4) < 3

    def nxt(v):  # right-neighbor cell within the group, 0 past the edge
        return jnp.where(has_next, pltpu.roll(v, NUM_CELLS - 1, axis=0), 0)

    def prv(v):  # value shifted from the left neighbor
        rolled = pltpu.roll(v, 1, axis=0)
        first = (jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) % 4) == 0
        return jnp.where(first, 0, rolled)

    slot = jax.lax.broadcasted_iota(jnp.int32, (NUM_CELLS, 1), 0) % 4

    def compress(x):
        # Exact one-shot compaction via prefix nonzero counts: the value
        # landing at slot k of a group is the unique nonzero cell whose count
        # of preceding nonzeros (within the group) equals k.
        nz = (x != 0).astype(jnp.int32)
        prefix = jnp.zeros_like(nz)
        for i in range(1, 4):
            shifted = pltpu.roll(nz, i, axis=0)
            prefix = prefix + jnp.where(slot >= i, shifted, 0)
        out = jnp.zeros_like(x)
        for o in range(4):
            xv = pltpu.roll(x, (NUM_CELLS - o) % NUM_CELLS, axis=0)
            pv = pltpu.roll(prefix, (NUM_CELLS - o) % NUM_CELLS, axis=0)
            in_group = slot + o <= 3
            take = in_group & (xv != 0) & (pv == slot)
            out = out + jnp.where(take, xv, 0)
        return out

    x = compress(x)

    score = jnp.zeros((1, x.shape[1]), jnp.int32)
    maxc = jnp.zeros((1, x.shape[1]), jnp.int32)
    # Sequential merge sweep across the 3 pair positions (left priority).
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % 4
    for i in range(3):
        at = (pos == i) & has_next
        pair = (x != 0) & (x == nxt(x)) & at
        new_exp = x + 1
        gained = jnp.where(pair, jnp.left_shift(1, new_exp), 0)
        score = score + jnp.sum(gained, axis=0, keepdims=True)
        maxc = jnp.maximum(maxc, jnp.max(jnp.where(pair, new_exp, 0), axis=0,
                                         keepdims=True))
        cleared = prv(pair.astype(jnp.int32)) == 1
        x = jnp.where(pair, new_exp, jnp.where(cleared, 0, x))

    return compress(x), score, maxc


def _kernel(work_ref, out_ref, scores_ref, maxc_ref):
    """Pure merge-left over one (16, BLOCK_N) pre-permuted tile. Score/maxc
    blocks carry 8 sublanes (Mosaic's minimum f32/i32 tile height); only
    sublane 0 is meaningful."""
    merged, score, maxc = _merge_left_block(work_ref[0])
    out_ref[0] = merged
    scores_ref[0] = jnp.broadcast_to(score, scores_ref.shape[1:])
    maxc_ref[0] = jnp.broadcast_to(maxc, maxc_ref.shape[1:])


@partial(jax.jit, static_argnames=("block_n",))
def merge_left_all_dirs(work: jnp.ndarray, block_n: int = BLOCK_N):
    """work: (4, 16, N) int32 — each direction's boards already permuted to
    cell-major merge-left layout. N must be a multiple of block_n.
    Returns (merged (4, 16, N), scores (4, N), max_created (4, N))."""
    N = work.shape[2]
    grid = (4, N // block_n)
    out, scores8, maxc8 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, NUM_CELLS, block_n), lambda d, i: (d, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, NUM_CELLS, block_n), lambda d, i: (d, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_n), lambda d, i: (d, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_n), lambda d, i: (d, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, NUM_CELLS, N), jnp.int32),
            jax.ShapeDtypeStruct((4, 8, N), jnp.int32),
            jax.ShapeDtypeStruct((4, 8, N), jnp.int32),
        ),
    )(work)
    return out, scores8[:, 0, :], maxc8[:, 0, :]


def all_moves(boards: jnp.ndarray, block_n: int = BLOCK_N):
    """Drop-in variant of engine.all_moves for (N, 4, 4) boards via the Pallas
    kernel. Returns the same MoveSet tuple. The direction permutations and
    legality compare are cheap XLA gathers around the Pallas merge."""
    from ..env.engine import MoveSet

    N = boards.shape[0]
    pad = (-N) % block_n
    cm = boards.reshape(N, NUM_CELLS).T  # (16, N)
    if pad:
        cm = jnp.pad(cm, ((0, 0), (0, pad)))
    work = cm[jnp.asarray(_PERMS)]  # (4, 16, Npad): per-direction row gather
    out, scores, maxc = merge_left_all_dirs(work, block_n)
    restored = jnp.take_along_axis(
        out, jnp.asarray(_INV_PERMS)[:, :, None], axis=1
    )  # undo each direction's permutation
    legal = jnp.any(restored != cm[None], axis=1)
    restored = restored[:, :, :N]
    boards_out = jnp.moveaxis(restored, 1, 2).reshape(4, N, 4, 4)
    return MoveSet(boards_out, scores[:, :N], maxc[:, :N], legal[:, :N])
