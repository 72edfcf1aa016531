import time
import numpy as np
import jax, jax.numpy as jnp
from tpu2048.env import engine
from tpu2048.ops import pallas_merge

rng = np.random.default_rng(0)
b = rng.integers(0, 12, size=(4096, 4, 4))
b = np.where(rng.random((4096,4,4)) < 0.35, 0, b).astype(np.int32)
jb = jnp.asarray(b)

t0 = time.perf_counter()
ms = pallas_merge.all_moves(jb)   # compiles the Mosaic kernel
jax.block_until_ready(ms.boards)
print(f"COMPILE+RUN OK in {time.perf_counter()-t0:.1f}s")

ref = jax.jit(engine.all_moves)(jb)
jax.block_until_ready(ref.boards)
for name in ("boards","scores","legal","max_created"):
    np.testing.assert_array_equal(np.asarray(getattr(ms,name)), np.asarray(getattr(ref,name)))
print("BIT-EXACT vs engine.all_moves on real TPU")

# latency comparison across batch sizes
import functools
pall = jax.jit(functools.partial(pallas_merge.all_moves))
xla = jax.jit(engine.all_moves)
for n in (256, 1024, 4096, 16384):
    bb = jnp.asarray(np.tile(b, (max(1,n//4096),1,1))[:n])
    for f, tag in ((pall,"pallas"), (xla,"xla")):
        out = f(bb); jax.block_until_ready(out.boards)
        best = 1e9
        for _ in range(20):
            t0 = time.perf_counter(); out = f(bb); jax.block_until_ready(out.boards)
            best = min(best, time.perf_counter()-t0)
        print(f"N={n:6d} {tag:6s} {best*1e6:8.1f} us  ({n/best/1e6:.1f}M boards/s)")
