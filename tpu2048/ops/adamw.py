"""AdamW (decoupled weight decay), functional, matching torch.optim.AdamW.

Used for 1D parameters (biases, norms) per the reference's split
(train.py:1591-1595): update with bias-corrected moments,
p <- p * (1 - lr*wd); p <- p - lr * m_hat / (sqrt(v_hat) + eps).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamWState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    m: dict
    v: dict


def init(params) -> AdamWState:
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    return AdamWState(jnp.zeros((), jnp.int32), zeros(), zeros())


def update(grads, state: AdamWState, params, lr, *, beta1: float = 0.9,
           beta2: float = 0.999, eps: float = 1e-8,
           weight_decay: float = 0.01) -> tuple:
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - beta1**t
    bc2 = 1.0 - beta2**t

    def one(p, g, m, v):
        new_m = beta1 * m + (1.0 - beta1) * g
        new_v = beta2 * v + (1.0 - beta2) * jnp.square(g)
        m_hat = new_m / bc1
        v_hat = new_v / bc2
        new_p = p * (1.0 - lr * weight_decay) - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return new_p, new_m, new_v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    outs = [one(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = treedef.unflatten([o[0] for o in outs])
    new_m = treedef.unflatten([o[1] for o in outs])
    new_v = treedef.unflatten([o[2] for o in outs])
    return new_params, AdamWState(step, new_m, new_v)
