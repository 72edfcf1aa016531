"""Full train-state checkpointing with resume.

The reference saves only a best-eval model checkpoint and has NO resume path
(``train --model`` exits, train.py:1508-1514; optimizer/RNG/EMA state never
saved — SURVEY.md §5.4). This framework checkpoints everything: params, both
optimizer moment sets, RTG moments, EMA trackers, PRNG keys and the step
counter, as a directory of {manifest.json, arrays.npz} — dependency-free.

Format v2: every leaf is stored under its full pytree KEY PATH (via
``jax.tree_util.keystr``), so a refactor that renames/moves parameters fails
loudly with the offending path instead of silently loading wrong weights by
flatten order. The manifest carries ``format_version``. v1 checkpoints
(``leaf_i`` keys, round 1) are still loadable by structural order with a leaf
count check.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 2


def _restore_leaf(template_leaf, value):
    if hasattr(template_leaf, "dtype"):
        return jnp.asarray(value, dtype=template_leaf.dtype)
    return type(template_leaf)(value)


def save_pytree(tree, path: Path) -> None:
    """Save a pytree of arrays as one .npz keyed by pytree key path."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in leaves_with_paths:
        k = jax.tree_util.keystr(p)
        assert k not in arrays, f"duplicate key path {k}"
        arrays[k] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def _load_pytree_v1(template, data):
    """Order-based loader for round-1 checkpoints (leaf_i keys)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(leaves) != len(data.files):
        raise ValueError(
            f"v1 checkpoint has {len(data.files)} leaves, template needs "
            f"{len(leaves)} — structure changed; cannot load by order"
        )
    new_leaves = [_restore_leaf(leaves[i], data[f"leaf_{i}"])
                  for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_pytree(template, path: Path):
    """Load arrays saved by save_pytree back into ``template``'s structure.

    Leaves are matched by key path; a missing or extra path raises with the
    offending path named."""
    data = np.load(path)
    files = set(data.files)
    if files and all(f.startswith("leaf_") for f in files):
        return _load_pytree_v1(template, data)

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    wanted = [jax.tree_util.keystr(p) for p, _ in leaves_with_paths]
    missing = [k for k in wanted if k not in files]
    extra = sorted(files - set(wanted))
    if missing or extra:
        raise ValueError(
            "checkpoint/template structure mismatch: "
            + (f"missing from checkpoint: {missing[:5]}" if missing else "")
            + ("; " if missing and extra else "")
            + (f"unexpected in checkpoint: {extra[:5]}" if extra else "")
        )
    new_leaves = []
    for k, (p, leaf) in zip(wanted, leaves_with_paths):
        stored = data[k]
        if hasattr(leaf, "shape") and tuple(stored.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch at {k}: checkpoint {tuple(stored.shape)} vs "
                f"template {tuple(leaf.shape)}"
            )
        new_leaves.append(_restore_leaf(leaf, stored))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(ckpt_dir, name: str, *, arrays_tree, manifest: dict) -> Path:
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    save_pytree(arrays_tree, d / f"{name}.npz")
    manifest = dict(manifest, format_version=FORMAT_VERSION)
    with open(d / f"{name}.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return d / f"{name}.npz"


def load_checkpoint(ckpt_dir, name: str, arrays_template):
    d = Path(ckpt_dir)
    with open(d / f"{name}.json") as f:
        manifest = json.load(f)
    arrays = load_pytree(arrays_template, d / f"{name}.npz")
    return arrays, manifest


def checkpoint_exists(ckpt_dir, name: str) -> bool:
    d = Path(ckpt_dir)
    return (d / f"{name}.npz").exists() and (d / f"{name}.json").exists()
