import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np, jax, jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from tpu2048.ops import pallas_merge
rng = np.random.default_rng(0)
boards = rng.integers(0,6,(256,4,4)).astype(np.int32)
with pltpu.force_tpu_interpret_mode():
    ms = pallas_merge.all_moves(jnp.asarray(boards), block_n=128)
print("ok", np.asarray(ms.scores).shape)
