import time
import numpy as np
import jax, jax.numpy as jnp
from tpu2048.train.loop import TrainConfig, build_model
from tpu2048.algo import update as U
from tpu2048.ops import OptimizerConfig, optimizer as opt

cfg = TrainConfig(hidden_size=196, num_layers=2)
model_cfg, init_fn, apply_eval, apply_train, labels_fn = build_model(cfg)
params = init_fn(jax.random.key(0))
labels = labels_fn(params)
opt_cfg = OptimizerConfig(learning_rate=1e-3, critic_lr=1e-4)
state = opt.init(params, labels)

def make_ds(S_cap, S_valid, rng):
    boards = rng.integers(0, 10, (S_cap, 4, 4)).astype(np.int8)
    return U.Dataset(
        board_before=jnp.asarray(boards),
        action=jnp.asarray(rng.integers(0, 4, S_cap), jnp.int32),
        action_mask=jnp.zeros((S_cap, 4), jnp.bool_),
        advantage=jnp.asarray(rng.normal(size=S_cap), jnp.float32),
        G_norm=jnp.asarray(rng.normal(size=S_cap), jnp.float32),
        logprobs=jnp.asarray(np.log(np.full((S_cap, 4), .25, np.float32))),
        valid=jnp.asarray(np.arange(S_cap) < S_valid),
    )

rng = np.random.default_rng(0)
args = (jnp.float32(0.02), jnp.float32(0.2), jnp.float32(1.0))
for S_cap, S_valid in ((655360, 98304), (98304, 98304), (655360, 655360)):
    f = jax.jit(U.make_optimize_fn(apply_train, labels, opt_cfg, 4096, 1, kl_diagnostic=False))
    ds = make_ds(S_cap, S_valid, rng)
    out = f(params, state, ds, jax.random.key(1), *args); jax.block_until_ready(out[0])
    best = 1e9
    for i in range(3):
        t0=time.perf_counter()
        out = f(params, state, ds, jax.random.key(2+i), *args); jax.block_until_ready(out[0])
        best=min(best, time.perf_counter()-t0)
    nb = int(np.asarray(out[2].num_batches))
    print(f"S_cap={S_cap:7d} S_valid={S_valid:7d} nb={nb:3d}: {best:.3f}s  ({best/max(nb,1)*1e3:.1f} ms/minibatch)")
