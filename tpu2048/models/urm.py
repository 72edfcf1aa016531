"""GameURM — recurrent transformer actor-critic (reference game.py:1355-1458).

Universal-Reasoning-Model adaptation: 16 board cells are tokens; the same stack
of blocks (non-causal MHA + ConvSwiGLU, post-add parameter-free RMSNorm,
game.py:1320-1352) is applied for ``num_loops`` recurrent iterations, the first
``num_truncated_loops`` of which run without gradient (truncated backprop,
game.py:1437-1443). Note the reference *disables* this model's training CLI
path (train.py:1528-1532) while shipping the full implementation; this
framework supports training it.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .initializers import (
    conv1d_depthwise_default_init,
    layer_norm_init,
    linear_init,
    zero_head,
)
from .layers import dropout, layer_norm, linear, rms_norm

NUM_CELLS = 16
NUM_ACTIONS = 4


@dataclass(frozen=True)
class URMConfig:
    """Mirrors the reference's GameURMConfig (game.py:31-43)."""

    hidden_dim: int = 64
    num_layers: int = 2
    num_heads: int = 4
    expansion: float = 2.67
    dropout: float = 0.1
    num_loops: int = 4
    num_truncated_loops: int = 1
    conv_kernel: int = 2
    rms_norm_eps: float = 1e-5

    @property
    def inter(self) -> int:
        """SwiGLU intermediate width: 2/3 of expansion, rounded up to a
        multiple of 8 (game.py:1246-1251)."""
        inter = round(self.expansion * self.hidden_dim * 2 / 3)
        return ((inter + 7) // 8) * 8

    def to_dict(self) -> dict:
        return {
            "hidden_dim": self.hidden_dim,
            "num_layers": self.num_layers,
            "num_heads": self.num_heads,
            "expansion": self.expansion,
            "dropout": self.dropout,
            "num_loops": self.num_loops,
            "num_truncated_loops": self.num_truncated_loops,
            "conv_kernel": self.conv_kernel,
            "rms_norm_eps": self.rms_norm_eps,
        }


def init(key: jax.Array, config: URMConfig, zero_heads: bool = True) -> dict:
    h, inter = config.hidden_dim, config.inter
    keys = iter(jax.random.split(key, 4 * config.num_layers + 8))
    blocks = []
    for _ in range(config.num_layers):
        blocks.append(
            {
                "qkv": linear_init(next(keys), 3 * h, h, bias=False),
                "o": linear_init(next(keys), h, h, bias=False),
                "gate_up": linear_init(next(keys), 2 * inter, h, bias=False),
                "dwconv": conv1d_depthwise_default_init(next(keys), inter, config.conv_kernel),
                "down": linear_init(next(keys), h, inter, bias=False),
            }
        )
    params = {
        "stem": {
            "lin": linear_init(next(keys), h, 3, bias=False),
            "ln": layer_norm_init(h),
        },
        "blocks": blocks,
        # Learnable initial hidden state, trunc-normal(std=0.02) (game.py:1386-1387).
        "init_hidden": 0.02 * jax.random.truncated_normal(next(keys), -100.0, 100.0, (1, NUM_CELLS, h)),
        "action_head": linear_init(next(keys), NUM_ACTIONS, h),
        "value_head": linear_init(next(keys), 1, h),
    }
    if zero_heads:
        params["action_head"] = zero_head(params["action_head"])
        params["value_head"] = zero_head(params["value_head"])
    return params


def _attention(p: dict, x: jnp.ndarray, config: URMConfig, *,
               train: bool, rng: jax.Array | None) -> jnp.ndarray:
    """Non-causal MHA over the 16 cells (game.py:1279-1317). Dropout applies
    to the post-softmax attention weights, matching SDPA's dropout_p."""
    B, L, H = x.shape
    nh, hd = config.num_heads, config.hidden_dim // config.num_heads
    qkv = linear(p["qkv"], x).reshape(B, L, 3, nh, hd)
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))  # (B, nh, L, hd)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(hd))
    w = jax.nn.softmax(attn, axis=-1)
    w = dropout(w, config.dropout, rng, deterministic=not train)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = jnp.moveaxis(out, 1, 2).reshape(B, L, H)
    return linear(p["o"], out)


def _conv_swiglu(p: dict, x: jnp.ndarray, config: URMConfig) -> jnp.ndarray:
    """SwiGLU with a depthwise short conv over the cell sequence
    (game.py:1232-1276): silu(gate)*up -> depthwise conv1d(k, pad k//2, trim)
    -> silu -> down."""
    inter = config.inter
    gu = linear(p["gate_up"], x)
    gate, up = gu[..., :inter], gu[..., inter:]
    h = jax.nn.silu(gate) * up  # (B, L, inter)

    k = config.conv_kernel
    pad = k // 2
    L = h.shape[1]
    hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
    w = p["dwconv"]["w"]  # (inter, k)
    conv = jnp.zeros_like(hp[:, : L + 2 * pad - k + 1])
    for j in range(k):
        conv = conv + hp[:, j : j + L + 2 * pad - k + 1] * w[:, j]
    conv = conv[:, :L] + p["dwconv"]["b"]
    return linear(p["down"], jax.nn.silu(conv))


def _block(p: dict, x: jnp.ndarray, config: URMConfig, *,
           train: bool, rng: jax.Array | None) -> jnp.ndarray:
    """Post-add RMSNorm block (game.py:1343-1352)."""
    x = rms_norm(x + _attention(p, x, config, train=train, rng=rng), config.rms_norm_eps)
    x = rms_norm(x + _conv_swiglu(p, x, config), config.rms_norm_eps)
    return x


def apply(params: dict, config: URMConfig, inputs: jnp.ndarray, *,
          train: bool = False, rng: jax.Array | None = None) -> tuple:
    """inputs (B, 48) -> (action_logits (B, 4), value (B, 1)).

    Recurrent loops: each loop re-adds the input embeddings then runs the block
    stack; the first ``num_truncated_loops`` run under stop_gradient
    (game.py:1433-1449)."""
    if inputs.ndim == 1:
        inputs = inputs[None]
    B = inputs.shape[0]
    x = inputs.reshape(B, NUM_CELLS, 3).astype(jnp.float32)
    emb = jax.nn.silu(layer_norm(params["stem"]["ln"], linear(params["stem"]["lin"], x)))

    hidden = jnp.broadcast_to(params["init_hidden"], (B, NUM_CELLS, config.hidden_dim))

    n_rngs = config.num_loops * config.num_layers
    rngs = iter(jax.random.split(rng, n_rngs)) if (train and rng is not None) else iter(
        [None] * n_rngs
    )

    def run_loop(h):
        h = h + emb
        for block in params["blocks"]:
            h = _block(block, h, config, train=train, rng=next(rngs))
        return h

    for _ in range(config.num_truncated_loops):
        hidden = run_loop(hidden)
    if config.num_truncated_loops > 0:
        hidden = jax.lax.stop_gradient(hidden)
    for _ in range(config.num_loops - config.num_truncated_loops):
        hidden = run_loop(hidden)

    pooled = jnp.mean(hidden, axis=1)
    return linear(params["action_head"], pooled), linear(params["value_head"], pooled)


def param_labels(params: dict) -> dict:
    """Optimizer routing: {muon|adamw} x {value|other}. Muon takes strictly-2D
    weights; init_hidden (3D) and biases/norms go to AdamW, mirroring the
    reference's ndim split (game.py:1104-1120 routes ndim>=2 to Muon, but the
    torch Muon rejects non-2D, so 3D params must fall to AdamW for the model
    to train at all — a reference bug this framework fixes)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}" if path else k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        opt = "muon" if node.ndim == 2 else "adamw"
        group = "value" if path.startswith("value_head") else "other"
        return f"{opt}_{group}"

    return walk(params, "")
