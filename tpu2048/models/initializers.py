"""Weight initializers matching the reference's torch init choices.

The reference applies ``kaiming_uniform_(nonlinearity='relu')`` to every Linear
weight and zeroes biases (reference game.py:1054-1059, 1397-1402); LayerNorms
keep torch defaults (ones/zeros); Conv1d keeps torch's default
``kaiming_uniform_(a=sqrt(5))`` + uniform bias; and the training CLI zeroes the
action/value heads post-init (train.py:1559-1567) so the initial policy is
uniform and the initial value is exactly zero.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform_relu(key: jax.Array, shape: tuple, fan_in: int) -> jnp.ndarray:
    """torch.nn.init.kaiming_uniform_(w, nonlinearity='relu'):
    U(-b, b) with b = sqrt(2) * sqrt(3 / fan_in) = sqrt(6 / fan_in)."""
    bound = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def linear_init(key: jax.Array, out_features: int, in_features: int,
                bias: bool = True) -> dict:
    """A Linear layer dict {'w': (out,in)[, 'b': (out,)]} with the reference's
    kaiming-relu weight + zero bias."""
    p = {"w": kaiming_uniform_relu(key, (out_features, in_features), in_features)}
    if bias:
        p["b"] = jnp.zeros((out_features,), jnp.float32)
    return p


def layer_norm_init(dim: int) -> dict:
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def conv1d_depthwise_default_init(key: jax.Array, channels: int, kernel: int) -> dict:
    """torch Conv1d default init: kaiming_uniform_(a=sqrt(5)) on the weight
    (fan_in = in_channels/groups * kernel = kernel for depthwise) and
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on the bias."""
    fan_in = kernel
    w_bound = math.sqrt(1.0 / fan_in)  # gain sqrt(1/3) * sqrt(3/fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (channels, kernel), jnp.float32, -w_bound, w_bound),
        "b": jax.random.uniform(kb, (channels,), jnp.float32, -w_bound, w_bound),
    }


def zero_head(head: dict) -> dict:
    """Zero a Linear head (the reference's post-init head zeroing)."""
    out = {"w": jnp.zeros_like(head["w"])}
    if "b" in head:
        out["b"] = jnp.zeros_like(head["b"])
    return out
