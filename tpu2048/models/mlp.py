"""GameMLP — residual MLP actor-critic (reference game.py:1033-1220).

Architecture: stem Linear(48->h, no bias) + LayerNorm + ReLU; ``num_layers``
residual blocks ``x + Dropout(ReLU(LN(Linear(x, no bias))))``; action head
Linear(h->4) and value head Linear(h->1), both biased. ``decouple_critic``
detaches the value head's features from the trunk (game.py:1201-1203).

Represented as a params pytree + pure ``apply``; init matches the reference's
kaiming-relu everywhere with zeroed heads applied by the trainer
(train.py:1559-1567).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .initializers import layer_norm_init, linear_init, zero_head
from .layers import dropout, layer_norm, linear

INPUT_DIM = 48
NUM_ACTIONS = 4


@dataclass(frozen=True)
class MLPConfig:
    """Mirrors the reference's pydantic MLPConfig (game.py:24-28)."""

    hidden_dim: int = 64
    num_layers: int = 2
    dropout: float = 0.1
    decouple_critic: bool = False

    def to_dict(self) -> dict:
        return {
            "hidden_dim": self.hidden_dim,
            "num_layers": self.num_layers,
            "dropout": self.dropout,
            "decouple_critic": self.decouple_critic,
        }


def init(key: jax.Array, config: MLPConfig, zero_heads: bool = True) -> dict:
    keys = jax.random.split(key, config.num_layers + 3)
    params = {
        "stem": {
            "lin": linear_init(keys[0], config.hidden_dim, INPUT_DIM, bias=False),
            "ln": layer_norm_init(config.hidden_dim),
        },
        "blocks": [
            {
                "lin": linear_init(keys[1 + i], config.hidden_dim, config.hidden_dim, bias=False),
                "ln": layer_norm_init(config.hidden_dim),
            }
            for i in range(config.num_layers)
        ],
        "action_head": linear_init(keys[-2], NUM_ACTIONS, config.hidden_dim),
        "value_head": linear_init(keys[-1], 1, config.hidden_dim),
    }
    if zero_heads:
        params["action_head"] = zero_head(params["action_head"])
        params["value_head"] = zero_head(params["value_head"])
    return params


def apply(params: dict, config: MLPConfig, inputs: jnp.ndarray, *,
          train: bool = False, rng: jax.Array | None = None) -> tuple:
    """inputs (..., 48) -> (action_logits (..., 4), value (..., 1))."""
    x = inputs.astype(jnp.float32)
    x = jax.nn.relu(layer_norm(params["stem"]["ln"], linear(params["stem"]["lin"], x)))
    n_blocks = len(params["blocks"])
    drop_keys = (
        jax.random.split(rng, n_blocks) if (train and rng is not None) else [None] * n_blocks
    )
    for block, dk in zip(params["blocks"], drop_keys):
        h = jax.nn.relu(layer_norm(block["ln"], linear(block["lin"], x)))
        h = dropout(h, config.dropout, dk, deterministic=not train)
        x = x + h
    action_logits = linear(params["action_head"], x)
    features = jax.lax.stop_gradient(x) if config.decouple_critic else x
    value = linear(params["value_head"], features)
    return action_logits, value


def param_labels(params: dict) -> dict:
    """Optimizer routing labels, mirroring get_param_groups (game.py:1093-1127):
    {muon|adamw} x {value|other} — 2D weights go to Muon, 1D to AdamW, with the
    value head on its own learning rate."""

    def label(path: str, leaf: jnp.ndarray) -> str:
        opt = "muon" if leaf.ndim >= 2 else "adamw"
        group = "value" if path.startswith("value_head") else "other"
        return f"{opt}_{group}"

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}" if path else k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
            return type(node)(out) if isinstance(node, tuple) else out
        return label(path, node)

    return walk(params, "")


def num_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
