"""Tensor-parallel model sharding demonstration.

The 2048 models are far too small for TP to pay (≤ ~500k params — SURVEY.md
§2.8 records TP/PP/SP/EP as N/A), but the machinery costs nothing with GSPMD:
annotate the hidden dimension of every weight with a NamedSharding over the
('model',) mesh axis and jit the same pure apply function — XLA partitions the
matmuls and inserts the all-reduces. This module exists to prove the mesh and
the models are TP-ready, and as the template for any future larger family.

Sharding layout for GameMLP (column/row-parallel Megatron-style):
  stem.w      (h, 48)   -> P('model', None)   column-parallel
  blocks.w    (h, h)    -> P('model', None)   (LN params sharded on h too)
  heads.w     (4|1, h)  -> P(None, 'model')   row-parallel (psum by XLA)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mlp_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for GameMLP params over mesh axis 'model'."""
    col = NamedSharding(mesh, P("model", None))
    row = NamedSharding(mesh, P(None, "model"))
    vec = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())

    def shard(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "action_head" in names or "value_head" in names:
            return row if leaf.ndim == 2 else rep
        if leaf.ndim == 2:
            return col
        if leaf.ndim == 1:
            return vec  # LN scale/bias live on the hidden dim
        return rep

    return jax.tree_util.tree_map_with_path(shard, params)


def shard_mlp(params, mesh: Mesh):
    """Place GameMLP params TP-sharded on the mesh."""
    return jax.device_put(params, mlp_param_shardings(params, mesh))


def tp_forward(apply_fn, mesh: Mesh):
    """jit the apply fn with replicated activations in/out; XLA partitions the
    internals according to the param shardings (GSPMD)."""
    rep = NamedSharding(mesh, P())
    return jax.jit(apply_fn, out_shardings=(rep, rep))
