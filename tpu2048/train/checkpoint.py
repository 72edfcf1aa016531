"""Full train-state checkpointing with resume.

The reference saves only a best-eval model checkpoint and has NO resume path
(``train --model`` exits, train.py:1508-1514; optimizer/RNG/EMA state never
saved — SURVEY.md §5.4). This framework checkpoints everything: params, both
optimizer moment sets, RTG moments, EMA trackers, PRNG keys and the step
counter, as a directory of {manifest.json, arrays.npz} — dependency-free and
stable across versions.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(tree, path: Path) -> None:
    """Save an arbitrary pytree of arrays as one .npz via structure flattening.

    Structure is recovered by round-tripping through jax.tree flatten with a
    saved treedef-less path encoding; namedtuples are restored by the caller
    supplying a template (see load_pytree)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez_compressed(path, **arrays)


def load_pytree(template, path: Path):
    """Load arrays saved by save_pytree back into ``template``'s structure."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(leaves) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template needs {len(leaves)}"
        )
    new_leaves = [
        jnp.asarray(data[f"leaf_{i}"], dtype=leaves[i].dtype)
        if hasattr(leaves[i], "dtype") else type(leaves[i])(data[f"leaf_{i}"])
        for i in range(len(leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(ckpt_dir, name: str, *, arrays_tree, manifest: dict) -> Path:
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    save_pytree(arrays_tree, d / f"{name}.npz")
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
