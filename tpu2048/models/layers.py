"""Primitive layers shared by the model families. Pure functions over param
pytrees; no framework classes."""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch LayerNorm default


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y


def layer_norm(p: dict, x: jnp.ndarray, eps: float = LN_EPS) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def rms_norm(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Parameter-free RMSNorm computed in fp32 (reference game.py:1223-1229)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dtype)


def dropout(x: jnp.ndarray, rate: float, key: jax.Array | None,
            deterministic: bool) -> jnp.ndarray:
    """Inverted dropout matching torch semantics (scale by 1/(1-p) in train)."""
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
