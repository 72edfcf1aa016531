"""Combined optimizer: Muon for 2D weights, AdamW for the rest, with the value
head on its own learning rate — the reference's MultiOptimizer + param-group
split (train.py:1232-1281, 1587-1612; game.py:1093-1127) as one functional
transform.

Routing comes from a label pytree ('muon_other' | 'muon_value' |
'adamw_other' | 'adamw_value'); the global grad clip (norm 1.0, train.py:561)
is applied across ALL params jointly before routing, exactly as
``clip_grad_norm_(model.parameters())`` does.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import adamw, muon


@dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-3  # 'other' params (actor/trunk)
    critic_lr: float = 1e-3  # value-head params
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.01
    muon_momentum: float = 0.95
    muon_nesterov: bool = True
    adjust_lr_fn: str = "match_rms_adamw"
    grad_clip: float = 1.0


class OptState(NamedTuple):
    muon: muon.MuonState
    adamw: adamw.AdamWState


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def clip_by_global_norm(tree, max_norm: float) -> tuple:
    """torch.nn.utils.clip_grad_norm_ semantics: scale by max_norm/(norm+1e-6)
    only when norm > max_norm; returns (clipped, pre-clip norm)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, tree), norm


def init(params, labels=None) -> OptState:
    # Moment buffers cover the full tree; routing decides which are touched.
    return OptState(muon=muon.init(params), adamw=adamw.init(params))


def update(grads, state: OptState, params, labels, schedule_mult,
           config: OptimizerConfig) -> tuple:
    """One optimizer step (one minibatch in the reference's loop).

    ``schedule_mult`` is the cosine multiplier for the CURRENT train step
    (ticked once per rollout, not per minibatch). Returns
    (new_params, new_state, pre-clip grad norm)."""
    clipped, norm = clip_by_global_norm(grads, config.grad_clip)

    lr_other = config.learning_rate * schedule_mult
    lr_value = config.critic_lr * schedule_mult

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(clipped)
    flat_l = treedef.flatten_up_to(labels)
    flat_mbuf = treedef.flatten_up_to(state.muon.momentum)
    flat_m = treedef.flatten_up_to(state.adamw.m)
    flat_v = treedef.flatten_up_to(state.adamw.v)

    step = state.adamw.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - config.beta1**t
    bc2 = 1.0 - config.beta2**t

    # First pass: momentum/Nesterov directions; Newton-Schulz is deferred so
    # same-shape matrices batch into one vmapped orthogonalization (fewer,
    # larger MXU ops and a smaller program).
    muon_updates = {}  # idx -> (u, lr)
    new_p, new_mbuf, new_m, new_v = [None] * len(flat_p), [], [], []
    for i, (p, g, l, mbuf, m, v) in enumerate(
        zip(flat_p, flat_g, flat_l, flat_mbuf, flat_m, flat_v)
    ):
        lr = lr_value if l.endswith("value") else lr_other
        if l.startswith("muon"):
            nb = config.muon_momentum * mbuf + (1.0 - config.muon_momentum) * g
            u = (
                (1.0 - config.muon_momentum) * g + config.muon_momentum * nb
                if config.muon_nesterov
                else nb
            )
            muon_updates[i] = (u, lr)
            nm, nv = m, v
        else:
            nm = config.beta1 * m + (1.0 - config.beta1) * g
            nv = config.beta2 * v + (1.0 - config.beta2) * jnp.square(g)
            new_p[i] = p * (1.0 - lr * config.weight_decay) - lr * (nm / bc1) / (
                jnp.sqrt(nv / bc2) + 1e-8
            )
            nb = mbuf
        new_mbuf.append(nb)
        new_m.append(nm)
        new_v.append(nv)

    # Batched Newton-Schulz by shape group.
    by_shape = {}
    for i, (u, lr) in muon_updates.items():
        by_shape.setdefault(u.shape, []).append(i)
    ns_batched = jax.vmap(muon.newton_schulz)
    for shape, idxs in by_shape.items():
        stacked = jnp.stack([muon_updates[i][0] for i in idxs])
        orthos = ns_batched(stacked)
        for j, i in enumerate(idxs):
            p, lr = flat_p[i], muon_updates[i][1]
            o = orthos[j].astype(p.dtype)
            alr = muon.adjust_lr(lr, shape, config.adjust_lr_fn)
            new_p[i] = p * (1.0 - lr * config.weight_decay) - alr * o

    new_state = OptState(
        muon=muon.MuonState(treedef.unflatten(new_mbuf)),
        adamw=adamw.AdamWState(step, treedef.unflatten(new_m), treedef.unflatten(new_v)),
    )
    return treedef.unflatten(new_p), new_state, norm
