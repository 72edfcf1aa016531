"""Muon optimizer — momentum + Newton-Schulz orthogonalization, for 2D weights.

Functional JAX re-implementation matching torch.optim.Muon (the reference
trains with ``Muon(..., adjust_lr_fn="match_rms_adamw")``, train.py:1597):

  buf   <- mu * buf + (1 - mu) * g          (EMA momentum)
  u     <- (1 - mu) * g + mu * buf          (nesterov) else buf
  O     <- NewtonSchulz5(u)                 (bfloat16, 5 quintic iterations)
  p     <- p * (1 - lr * wd)                (decoupled weight decay, raw lr)
  p     <- p - adjust(lr, shape) * O

adjust(lr, (A, B)) = 0.2 * sqrt(max(A, B)) * lr  for "match_rms_adamw",
sqrt(max(1, A/B)) * lr for "original".

The Newton-Schulz iteration runs in bfloat16 — natively fast on TPU MXU — with
the quintic coefficients (3.4445, -4.7750, 2.0315).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

NS_COEFFS = (3.4445, -4.7750, 2.0315)
NS_STEPS = 5
EPS = 1e-7


def newton_schulz(g: jnp.ndarray, steps: int = NS_STEPS,
                  coeffs: tuple = NS_COEFFS, eps: float = EPS) -> jnp.ndarray:
    """Quintic Newton-Schulz orthogonalization of a 2D matrix, in bfloat16."""
    a, b, c = coeffs
    x = g.astype(jnp.bfloat16)
    transpose = g.shape[0] > g.shape[1]
    if transpose:
        x = x.T
    norm = jnp.maximum(jnp.linalg.norm(x), eps).astype(jnp.bfloat16)
    x = x / norm
    for _ in range(steps):
        gram = jnp.dot(x, x.T, preferred_element_type=jnp.bfloat16)
        gram_update = b * gram + c * jnp.dot(gram, gram, preferred_element_type=jnp.bfloat16)
        x = a * x + jnp.dot(gram_update, x, preferred_element_type=jnp.bfloat16)
    if transpose:
        x = x.T
    return x


def adjust_lr(lr, shape: tuple, adjust_lr_fn: str | None = "match_rms_adamw"):
    A, B = shape[0], shape[1]
    if adjust_lr_fn is None or adjust_lr_fn == "original":
        return lr * math.sqrt(max(1.0, A / B))
    if adjust_lr_fn == "match_rms_adamw":
        return lr * (0.2 * math.sqrt(max(A, B)))
    return lr


class MuonState(NamedTuple):
    momentum: dict  # same pytree structure as the params it covers


def init(params) -> MuonState:
    return MuonState(jax.tree.map(jnp.zeros_like, params))


def update(grads, state: MuonState, params, lr, *, weight_decay: float = 0.01,
           momentum: float = 0.95, nesterov: bool = True,
           adjust_lr_fn: str = "match_rms_adamw") -> tuple:
    """One Muon step over a pytree of 2D params. ``lr`` may be a traced scalar
    (the cosine schedule value). Returns (new_params, new_state)."""

    def one(p, g, buf):
        new_buf = momentum * buf + (1.0 - momentum) * g
        u = (1.0 - momentum) * g + momentum * new_buf if nesterov else new_buf
        o = newton_schulz(u).astype(p.dtype)
        alr = adjust_lr(lr, p.shape, adjust_lr_fn)
        new_p = p * (1.0 - lr * weight_decay) - alr * o
        return new_p, new_buf

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_b = treedef.flatten_up_to(state.momentum)
    outs = [one(p, g, b) for p, g, b in zip(flat_p, flat_g, flat_b)]
    new_params = treedef.unflatten([o[0] for o in outs])
    new_momentum = treedef.unflatten([o[1] for o in outs])
    return new_params, MuonState(new_momentum)
