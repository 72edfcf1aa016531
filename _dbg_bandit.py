import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np, jax, jax.numpy as jnp
from tpu2048.algo import update as U
from tpu2048.models import MLPConfig, mlp
from tpu2048.models.encoding import encode_boards
from tpu2048.ops import OptimizerConfig
from tpu2048.ops import optimizer as opt

# Bandit: fixed boards; action 2 always has advantage +1, others -1.
cfg = MLPConfig(hidden_dim=32, num_layers=1, dropout=0.0)
params = mlp.init(jax.random.key(0), cfg)  # zero heads -> uniform
labels = mlp.param_labels(params)
ocfg = OptimizerConfig(learning_rate=1e-3, critic_lr=1e-3)
state = opt.init(params, labels)
apply_train = lambda p, x, r: mlp.apply(p, cfg, x, train=True, rng=r)
optimize = jax.jit(U.make_optimize_fn(apply_train, labels, ocfg, 32, 1))

rng = np.random.default_rng(0)
S = 256
boards = rng.integers(0, 8, (S,4,4)).astype(np.int8)
actions = rng.integers(0, 4, S).astype(np.int32)
adv = np.where(actions == 2, 1.0, -1.0).astype(np.float32)
lp = np.log(np.full((S,4), 0.25, np.float32))
ds = U.Dataset(
    board_before=jnp.asarray(boards), action=jnp.asarray(actions),
    action_mask=jnp.zeros((S,4), bool), advantage=jnp.asarray(adv),
    G_norm=jnp.asarray(adv*0), logprobs=jnp.asarray(lp),
    valid=jnp.ones(S, bool))

enc = encode_boards(jnp.asarray(boards, jnp.int32))
for it in range(15):
    logits, _ = mlp.apply(params, cfg, enc)
    probs = np.asarray(jax.nn.softmax(logits, -1)).mean(0)
    if it % 3 == 0: print(f"iter {it}: P(action)={np.round(probs,3)}")
    params, state, stats = optimize(params, state, ds, jax.random.key(it),
                                    jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0))
logits, _ = mlp.apply(params, cfg, enc)
probs = np.asarray(jax.nn.softmax(logits, -1)).mean(0)
print("final:", np.round(probs,3))
assert probs[2] > 0.5, "policy should have concentrated on action 2"
print("BANDIT TEST PASSED")
