import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from tpu2048.env import engine

N=8192
@partial(jax.jit, static_argnums=2)
def run(boards, key, steps):
    def body(c, _):
        boards, key = c
        key, k_act, k_spawn = jax.random.split(key, 3)
        moves = engine.all_moves(boards)
        logits = jnp.where(moves.action_mask, -jnp.inf, 0.0)
        all_invalid = jnp.all(moves.action_mask, axis=-1, keepdims=True)
        action = jax.random.categorical(k_act, jnp.where(all_invalid, 0.0, logits), axis=-1)
        res = engine.step(boards, action, k_spawn, moves=moves)
        fresh = engine.reset(k_spawn, boards.shape[:-2])
        boards = jnp.where(res.done[:, None, None], fresh, res.board)
        return (boards, key), res.reward.sum()
    (boards, _), rewards = jax.lax.scan(body, (boards, key), None, length=steps)
    return boards, rewards.sum()

boards = jax.jit(lambda k: engine.reset(k, (N,)))(jax.random.key(0))
for steps in (64, 256):
    jax.block_until_ready(run(boards, jax.random.key(1), steps))
    t0=time.perf_counter(); jax.block_until_ready(run(boards, jax.random.key(2), steps)); dt=time.perf_counter()-t0
    print(f"steps={steps}: {dt*1e3:.2f} ms -> {N*steps/dt/1e6:.1f} M steps/s")
