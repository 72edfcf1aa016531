"""Checkpoint format v2: key-path-addressed leaves, loud structure mismatch,
and v1 (leaf_i) backward compatibility."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.train import checkpoint as CKPT


def _tree():
    return {
        "params": {"stem": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
                   "head": {"w": jnp.ones((3,), jnp.float32)}},
        "step": jnp.int32(7),
    }


def test_roundtrip_v2(tmp_path):
    tree = _tree()
    CKPT.save_checkpoint(tmp_path, "t", arrays_tree=tree, manifest={"a": 1})
    data = np.load(tmp_path / "t.npz")
    # leaves stored by key path, not order
    assert any("stem" in k for k in data.files), data.files
    template = jax.tree.map(jnp.zeros_like, tree)
    loaded, manifest = CKPT.load_checkpoint(tmp_path, "t", template)
    assert manifest["format_version"] == CKPT.FORMAT_VERSION
    assert manifest["a"] == 1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), loaded, tree)


def test_mismatched_tree_raises_with_path(tmp_path):
    CKPT.save_checkpoint(tmp_path, "t", arrays_tree=_tree(), manifest={})
    bad = _tree()
    bad["params"]["extra_layer"] = {"w": jnp.zeros((2,))}
    with pytest.raises(ValueError, match="extra_layer"):
        CKPT.load_checkpoint(tmp_path, "t", bad)

    renamed = {"params": {"stem2": _tree()["params"]["stem"]}, "step": jnp.int32(0)}
    with pytest.raises(ValueError, match="stem2"):
        CKPT.load_checkpoint(tmp_path, "t", renamed)


def test_shape_mismatch_raises(tmp_path):
    CKPT.save_checkpoint(tmp_path, "t", arrays_tree=_tree(), manifest={})
    bad = _tree()
    bad["params"]["stem"]["w"] = jnp.zeros((4, 3), jnp.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        CKPT.load_checkpoint(tmp_path, "t", bad)


def test_v1_legacy_load(tmp_path):
    tree = _tree()
    leaves, _ = jax.tree_util.tree_flatten(tree)
    np.savez_compressed(tmp_path / "t.npz",
                        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    (tmp_path / "t.json").write_text("{}")
    loaded, _ = CKPT.load_checkpoint(tmp_path, "t", jax.tree.map(jnp.zeros_like, tree))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), loaded, tree)

    # wrong leaf count fails loudly
    np.savez_compressed(tmp_path / "u.npz",
                        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves[:-1])})
    (tmp_path / "u.json").write_text("{}")
    with pytest.raises(ValueError, match="v1 checkpoint"):
        CKPT.load_checkpoint(tmp_path, "u", tree)
