import time, numpy as np, jax, jax.numpy as jnp
from tpu2048.env import engine

def timeit(fn, *a, n=20):
    jax.block_until_ready(fn(*a))
    best = 1e9
    for _ in range(n):
        t0=time.perf_counter(); jax.block_until_ready(fn(*a)); best=min(best,time.perf_counter()-t0)
    return best

N = 8192
boards = jax.jit(lambda k: engine.reset(k,(N,)))(jax.random.key(0))

am = jax.jit(engine.all_moves)
print("all_moves single call:", timeit(am, boards)*1e6, "us")

st = jax.jit(lambda b,k: engine.step(b, jnp.zeros(b.shape[0],dtype=jnp.int32), k))
print("step single call:", timeit(st, boards, jax.random.key(1))*1e6, "us")

sp = jax.jit(engine.spawn_tile)
print("spawn single call:", timeit(sp, boards, jax.random.key(2))*1e6, "us")

from functools import partial
@partial(jax.jit, static_argnums=2)
def scan_steps(boards, key, steps):
    def body(c,_):
        boards,key = c
        key,k1,k2 = jax.random.split(key,3)
        moves = engine.all_moves(boards)
        logits = jnp.where(moves.action_mask, -jnp.inf, 0.)
        ai = jnp.all(moves.action_mask,axis=-1,keepdims=True)
        act = jax.random.categorical(k1, jnp.where(ai,0.,logits),axis=-1)
        res = engine.step(boards, act, k2, moves=moves)
        fresh = engine.reset(k2, boards.shape[:-2])
        return (jnp.where(res.done[:,None,None], fresh, res.board), key), None
    (b,_),_ = jax.lax.scan(body,(boards,key),None,length=steps)
    return b

t = timeit(scan_steps, boards, jax.random.key(3), 64, n=5)
print("scan 64 steps:", t*1e3, "ms ->", N*64/t/1e6, "M steps/s")
