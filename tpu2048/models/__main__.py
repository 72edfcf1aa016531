"""Smoke block: build random boards, forward both model families, print
shapes and parameter counts (the reference's only 'test', game.py:1472-1500).

Run: python -m tpu2048.models
"""

import jax

from ..env import engine
from . import MLPConfig, URMConfig, encode_boards, mlp, urm


def main() -> None:
    boards = engine.reset(jax.random.key(0), (3,))
    stacked = encode_boards(boards)

    print("=== Testing GameMLP ===")
    cfg = MLPConfig(hidden_dim=64)
    params = mlp.init(jax.random.key(1), cfg, zero_heads=False)
    logits, value = mlp.apply(params, cfg, stacked)
    print(f"Action logits shape: {logits.shape}")
    print(f"Value shape: {value.shape}")
    print(f"Action logits:\n{logits}")

    print("\n=== Testing GameURM ===")
    ucfg = URMConfig(hidden_dim=64, num_loops=4, num_truncated_loops=1)
    uparams = urm.init(jax.random.key(2), ucfg, zero_heads=False)
    ulogits, uvalue = urm.apply(uparams, ucfg, stacked)
    print(f"Action logits shape: {ulogits.shape}")
    print(f"Value shape: {uvalue.shape}")
    print(f"Action logits:\n{ulogits}")

    print("\n=== Parameter Counts ===")
    print(f"GameMLP: {mlp.num_params(params):,} parameters")
    print(f"GameURM: {mlp.num_params(uparams):,} parameters")


if __name__ == "__main__":
    main()
