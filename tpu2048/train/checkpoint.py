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

Fault tolerance (round 3): saves are crash-atomic and loads detect
corruption. The reference has neither (it ``torch.save``s in place,
train.py:1902 — a preemption mid-save destroys the only copy). Here:

  * The .npz is written to a temp file and committed with ``os.replace``,
    so a kill/preemption at ANY instant leaves either the old complete
    checkpoint or the new complete checkpoint — never a truncated one.
  * The manifest is embedded INSIDE the .npz (``__manifest__`` member), so
    the commit point is a single atomic rename. The sibling ``.json`` is a
    human-readable mirror written after the commit; if a crash lands between
    the two writes, the embedded manifest wins on load (the mirror is only
    trusted for v1/v2-early checkpoints that lack the embedded copy).
  * Every member read is CRC-32-checked by the zip layer; truncation or
    bit-rot raises :class:`CheckpointCorruptError` naming the file, instead
    of feeding garbage weights into training.
"""

from __future__ import annotations

import json
import os
import zipfile
import zlib
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 2
_MANIFEST_KEY = "__manifest__"
_CORRUPTION_ERRORS = (zipfile.BadZipFile, zlib.error, EOFError, OSError)


class CheckpointCorruptError(RuntimeError):
    """A checkpoint file is unreadable: truncated, bit-rotted, or not an npz."""


def _restore_leaf(template_leaf, value):
    if hasattr(template_leaf, "dtype"):
        return jnp.asarray(value, dtype=template_leaf.dtype)
    return type(template_leaf)(value)


def save_pytree(tree, path: Path, *, manifest: dict | None = None) -> None:
    """Save a pytree of arrays as one .npz keyed by pytree key path.

    Crash-atomic: written to ``<path>.tmp.npz`` then ``os.replace``d into
    place, so an interrupted save never clobbers an existing checkpoint.
    If ``manifest`` is given it is embedded as a JSON string under
    ``__manifest__`` so metadata commits in the same atomic rename.
    """
    path = Path(path)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in leaves_with_paths:
        k = jax.tree_util.keystr(p)
        assert k not in arrays, f"duplicate key path {k}"
        arrays[k] = np.asarray(leaf)
    if manifest is not None:
        arrays[_MANIFEST_KEY] = np.array(json.dumps(manifest))
    tmp = path.with_name(path.stem + ".tmp.npz")
    try:
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        tmp.unlink(missing_ok=True)


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


def load_pytree(template, path: Path, *, return_manifest: bool = False):
    """Load arrays saved by save_pytree back into ``template``'s structure.

    Leaves are matched by key path; a missing or extra path raises with the
    offending path named. Truncated/bit-rotted files raise
    :class:`CheckpointCorruptError` (zip CRC-32 verifies every member read).
    With ``return_manifest=True`` returns ``(tree, manifest_or_None)`` where
    the manifest is the atomically-embedded ``__manifest__`` copy if present.
    """
    try:
        data = np.load(path)
        files = set(data.files)
    except _CORRUPTION_ERRORS + (ValueError,) as e:
        raise CheckpointCorruptError(
            f"checkpoint {path} is unreadable ({type(e).__name__}: {e}); "
            "it may be truncated or corrupted on disk") from e

    manifest = None
    try:
        if _MANIFEST_KEY in files:
            files.discard(_MANIFEST_KEY)
            manifest = json.loads(str(data[_MANIFEST_KEY]))
        if files and all(f.startswith("leaf_") for f in files):
            tree = _load_pytree_v1(template, data)
            return (tree, manifest) if return_manifest else tree

        leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
            template)
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
                    f"shape mismatch at {k}: checkpoint {tuple(stored.shape)} "
                    f"vs template {tuple(leaf.shape)}"
                )
            new_leaves.append(_restore_leaf(leaf, stored))
        tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
        return (tree, manifest) if return_manifest else tree
    except _CORRUPTION_ERRORS as e:
        raise CheckpointCorruptError(
            f"checkpoint {path} failed a CRC/read check mid-load "
            f"({type(e).__name__}: {e}); it is corrupted on disk") from e


def save_checkpoint(ckpt_dir, name: str, *, arrays_tree, manifest: dict) -> Path:
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    manifest = dict(manifest, format_version=FORMAT_VERSION)
    # Single atomic commit point: manifest rides inside the npz.
    save_pytree(arrays_tree, d / f"{name}.npz", manifest=manifest)
    # Human-readable mirror for tooling/inspection, written post-commit
    # (atomically too, so external readers never see a partial JSON).
    tmp = d / f"{name}.tmp.json"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, d / f"{name}.json")
    return d / f"{name}.npz"


def load_checkpoint(ckpt_dir, name: str, arrays_template):
    d = Path(ckpt_dir)
    arrays, manifest = load_pytree(arrays_template, d / f"{name}.npz",
                                   return_manifest=True)
    if manifest is None:
        # Pre-round-3 checkpoint without the embedded copy: trust the mirror.
        with open(d / f"{name}.json") as f:
            manifest = json.load(f)
    return arrays, manifest


def checkpoint_exists(ckpt_dir, name: str) -> bool:
    """True if a loadable checkpoint is present.

    The .npz is the checkpoint (manifest embedded since round 3); the .json
    mirror is only required for legacy files that lack the embedded manifest
    — so a crash between the npz commit and the mirror write still counts.
    """
    d = Path(ckpt_dir)
    npz = d / f"{name}.npz"
    if not npz.exists():
        return False
    if (d / f"{name}.json").exists():
        return True
    try:
        with zipfile.ZipFile(npz) as z:
            return f"{_MANIFEST_KEY}.npy" in z.namelist()
    except _CORRUPTION_ERRORS:
        return False
