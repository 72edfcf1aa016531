#!/usr/bin/env python
"""Clean XLA-vs-Pallas latency comparison for the fused 4-direction merge
(`engine.all_moves` vs `ops/pallas_merge.all_moves`).

Round-2 note (BENCH.md): the first measurement attempt ran while a training
job held the chip, so both backends pinned at the attachment's ~22 ms floor.
This script is meant to run on an IDLE chip. Methodology:

 * CHAIN merges to amortize dispatch: y = all_moves(x).boards[i % 4] feeds the
   next iteration, so one dispatch covers `chain` dependent merges and the
   per-merge latency is (trip time) / chain.
 * Hard device->host fetch as the barrier (block_until_ready returns early on
   this remote attachment — see bench.py:_fetch).
 * Bit-exactness of the two backends is asserted here as well (same check as
   tests/test_pallas.py, but on the real device this script runs on).

Prints a per-N table to stderr and one JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from tpu2048.env import engine
from tpu2048.ops import pallas_merge


def _fetch(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


@partial(jax.jit, static_argnames=("chain", "backend"))
def chained(boards, chain: int, backend: str):
    """`chain` dependent merges; rotate through directions so the chain can't
    collapse to a fixpoint XLA could shortcut."""
    fn = engine.all_moves if backend == "xla" else pallas_merge.all_moves

    def body(b, i):
        ms = fn(b)
        nxt = ms.boards[i % 4]
        # Re-seed a tile deterministically so boards don't empty out: bump the
        # top-left cell's exponent (mod 10) when the board went static.
        bumped = nxt.at[:, 0, 0].set((nxt[:, 0, 0] + 1) % 10)
        return jnp.where(ms.legal[i % 4][:, None, None], nxt, bumped), 0

    out, _ = jax.lax.scan(body, boards, jnp.arange(chain))
    return out


def bench_one(n: int, chain: int = 200, repeats: int = 5) -> dict:
    rng = np.random.default_rng(0)
    boards = jnp.asarray(rng.integers(0, 8, (n, 4, 4)), jnp.int32)

    # Bit-exactness on this device first.
    ref = jax.jit(engine.all_moves)(boards)
    pal = jax.jit(pallas_merge.all_moves)(boards)
    for a, b, name in [(ref.boards, pal.boards, "boards"),
                       (ref.scores, pal.scores, "scores"),
                       (ref.legal, pal.legal, "legal")]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)

    out = {"batch": n, "chain": chain}
    for backend in ("xla", "pallas"):
        _fetch(chained(boards, chain, backend))  # compile + barrier
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _fetch(chained(boards, chain, backend))
            best = min(best, time.perf_counter() - t0)
        out[backend + "_us_per_merge"] = round(best / chain * 1e6, 2)
    out["pallas_over_xla"] = round(
        out["pallas_us_per_merge"] / out["xla_us_per_merge"], 3)
    return out


def main():
    rows = [bench_one(n) for n in (512, 2048, 8192, 16384, 65536)]
    print(f"{'N':>7} {'xla us':>9} {'pallas us':>10} {'ratio':>6}",
          file=sys.stderr)
    for r in rows:
        print(f"{r['batch']:>7} {r['xla_us_per_merge']:>9} "
              f"{r['pallas_us_per_merge']:>10} {r['pallas_over_xla']:>6}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "all_moves_latency_comparison",
        "device": jax.devices()[0].device_kind,
        "bit_exact": True,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
