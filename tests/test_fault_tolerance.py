"""Fault injection for the checkpoint/resume path (SURVEY.md §5.3).

The reference has NO fault story: it ``torch.save``s its only checkpoint in
place (reference train.py:1902) — a preemption mid-save destroys it — and has
no resume path at all (train.py:1508-1514). This framework claims crash-atomic
saves, CRC-verified loads, and full resume; these tests inject the faults:

  * a save interrupted mid-write (simulated writer crash) must leave the
    previous checkpoint intact and loadable;
  * a truncated or bit-flipped .npz must raise CheckpointCorruptError, never
    feed garbage weights into training;
  * SIGKILL-ing a live training run (the real CLI, any instant after the
    first checkpoint) must leave a state from which ``--resume`` runs to
    completion.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.train import checkpoint as CKPT

REPO = Path(__file__).resolve().parent.parent


def _tree(fill=0.0):
    return {"params": {"w": jnp.full((3, 2), fill, jnp.float32)},
            "step": jnp.int32(int(fill))}


def test_interrupted_save_preserves_previous(tmp_path, monkeypatch):
    CKPT.save_checkpoint(tmp_path, "t", arrays_tree=_tree(1.0),
                         manifest={"train_step": 1})

    real_savez = np.savez_compressed

    def crash_mid_write(path, **arrays):
        # write a partial garbage file where the tmp would be, then die —
        # models a preemption/OOM-kill landing inside the npz writer.
        Path(path).write_bytes(b"PK\x03\x04 partial garbage")
        raise RuntimeError("injected writer crash")

    monkeypatch.setattr(CKPT.np, "savez_compressed", crash_mid_write)
    with pytest.raises(RuntimeError, match="injected"):
        CKPT.save_checkpoint(tmp_path, "t", arrays_tree=_tree(2.0),
                             manifest={"train_step": 2})
    monkeypatch.setattr(CKPT.np, "savez_compressed", real_savez)

    # the old checkpoint is untouched and loadable; no tmp litter remains
    assert CKPT.checkpoint_exists(tmp_path, "t")
    tree, manifest = CKPT.load_checkpoint(tmp_path, "t", _tree())
    assert manifest["train_step"] == 1
    np.testing.assert_array_equal(np.asarray(tree["params"]["w"]),
                                  np.full((3, 2), 1.0, np.float32))
    assert not list(tmp_path.glob("*.tmp.*"))


@pytest.mark.parametrize("damage", ["truncate", "bitflip"])
def test_corrupted_checkpoint_detected(tmp_path, damage):
    CKPT.save_checkpoint(tmp_path, "t", arrays_tree=_tree(3.0),
                         manifest={"train_step": 3})
    npz = tmp_path / "t.npz"
    raw = bytearray(npz.read_bytes())
    if damage == "truncate":
        raw = raw[: len(raw) // 2]
    else:  # flip a run of bytes mid-file: zip CRC-32 must catch it on read
        mid = len(raw) // 2
        for i in range(mid, mid + 8):
            raw[i] ^= 0xFF
    npz.write_bytes(bytes(raw))

    with pytest.raises(CKPT.CheckpointCorruptError):
        CKPT.load_checkpoint(tmp_path, "t", _tree())


def test_npz_only_checkpoint_is_complete(tmp_path):
    """A crash between the npz commit and the .json mirror write leaves a
    fully valid checkpoint: the manifest is embedded in the npz."""
    CKPT.save_checkpoint(tmp_path, "t", arrays_tree=_tree(4.0),
                         manifest={"train_step": 4})
    (tmp_path / "t.json").unlink()
    assert CKPT.checkpoint_exists(tmp_path, "t")
    tree, manifest = CKPT.load_checkpoint(tmp_path, "t", _tree())
    assert manifest["train_step"] == 4
    assert manifest["format_version"] == CKPT.FORMAT_VERSION


def test_stale_mirror_loses_to_embedded_manifest(tmp_path):
    CKPT.save_checkpoint(tmp_path, "t", arrays_tree=_tree(5.0),
                         manifest={"train_step": 5})
    (tmp_path / "t.json").write_text(json.dumps({"train_step": 999}))
    _, manifest = CKPT.load_checkpoint(tmp_path, "t", _tree())
    assert manifest["train_step"] == 5


def _manifest(ck):
    # After a SIGKILL the .json mirror may lag the npz by one save; the
    # embedded manifest is the authoritative one (what --resume will use).
    data = np.load(ck / "train_state.npz")
    return json.loads(str(data["__manifest__"]))


def _train_cmd(tmp_path, steps):
    return [
        sys.executable, str(REPO / "train.py"), "train",
        "--platform", "cpu",
        "--steps", str(steps), "--episodes", "4", "--batch-size", "8",
        "--scan-cap", "48", "-H", "16", "--num-layers", "1",
        "--warmup-steps", "1", "--points", "0.1", "--mono", "1.0",
        "--upsample-ratio", "0.25", "--print-freq", "1",
        "--checkpoint-freq", "1", "--resume",
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--log-dir", str(tmp_path / "logs"),
    ]


def test_sigkill_then_resume_completes(tmp_path):
    # NB: JAX_PLATFORMS env is ignored in this image — --platform cpu in
    # _train_cmd is what actually keeps the subprocess off the TPU.
    env = dict(os.environ)
    ck = tmp_path / "ck"

    # run 1: killed with SIGKILL at an arbitrary instant after the first
    # banked checkpoint (checkpoint-freq 1) — possibly mid-save.
    p = subprocess.Popen(_train_cmd(tmp_path, steps=50),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(REPO))
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if CKPT.checkpoint_exists(ck, "train_state"):
                break
            if p.poll() is not None:
                out = p.communicate()[0].decode()
                pytest.fail(f"run 1 exited before first checkpoint:\n{out[-3000:]}")
            time.sleep(0.2)
        else:
            pytest.fail("no checkpoint appeared within 300s")
    finally:
        if p.poll() is None:
            os.kill(p.pid, signal.SIGKILL)
        p.communicate()

    assert CKPT.checkpoint_exists(ck, "train_state")
    banked = _manifest(ck)["train_step"]

    # run 2: --resume must pick up from the banked step and run to completion
    total = banked + 3
    out = subprocess.run(_train_cmd(tmp_path, steps=total),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(REPO), timeout=600)
    text = out.stdout.decode()
    assert out.returncode == 0, text[-3000:]
    assert f"Resumed from step {banked + 1}" in text, text[-3000:]
    assert _manifest(ck)["train_step"] == total - 1
