"""Checkpoint/resume fidelity: training 2+2 steps with a resume in the middle
must reproduce the uninterrupted 4-step run exactly (params, moments, RNG) —
the capability the reference lacks entirely (SURVEY.md §5.4)."""

import numpy as np
import jax
import pytest

from tpu2048.train.loop import TrainConfig, train


def _cfg(tmp, steps, **kw):
    base = dict(
        steps=steps, num_episodes=2, batch_size=16, points_weight=0.1,
        monotonicity_weight=1.0, scan_cap=128, print_frequency=1000,
        warmup_steps=1, hidden_size=16, num_layers=1, seed=3,
        checkpoint_dir=str(tmp), log_dir=None, viz_dir=None,
        upsample_ratio=0.0, checkpoint_freq=None,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    d1 = tmp_path / "uninterrupted"
    d2 = tmp_path / "resumed"

    out_full = train(_cfg(d1, steps=4))

    train(_cfg(d2, steps=2))
    out_resumed = train(_cfg(d2, steps=4, resume=True))

    flat_a = jax.tree.leaves(out_full["params"])
    flat_b = jax.tree.leaves(out_resumed["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(
        float(out_full["moments"].mu), float(out_resumed["moments"].mu), atol=1e-6
    )
    assert out_full["highest_score"] == out_resumed["highest_score"]


def test_resume_past_end_does_not_clobber_checkpoint(tmp_path):
    """A resume whose start_step is already >= cfg.steps runs zero steps and
    must leave the checkpoint untouched. The unguarded final save used to
    overwrite train_step with cfg.steps-1, resetting the RTG bias correction
    (1 - beta^step) and inflating warm-started moments into a negative
    variance on the NEXT resume."""
    import json

    d = tmp_path / "run"
    train(_cfg(d, steps=4, checkpoint_freq=None))
    manifest = json.load(open(d / "train_state.json"))
    assert manifest["train_step"] == 3

    # Resume with a target far below the checkpointed step: no-op required.
    train(_cfg(d, steps=2, resume=True))
    manifest = json.load(open(d / "train_state.json"))
    assert manifest["train_step"] == 3


def test_packed_resume_reproduces_uninterrupted_run(tmp_path):
    """Packed mode: with the EnvCarry checkpointed (round 5 — VERDICT r4
    item 7), a 2+2-step packed run must reproduce the uninterrupted 4-step
    run EXACTLY: boards, per-lane episode accumulators, and the env RNG
    chain all resume in place, so the rollouts are bit-identical."""
    pk = dict(packed=True, lanes=8, horizon=32, checkpoint_freq=2)
    d1 = tmp_path / "uninterrupted"
    d2 = tmp_path / "resumed"

    out_full = train(_cfg(d1, steps=4, **pk))
    train(_cfg(d2, steps=2, **pk))
    assert (d2 / "env_carry.npz").exists(), "packed carry not checkpointed"
    out_resumed = train(_cfg(d2, steps=4, resume=True, **pk))

    for a, b in zip(jax.tree.leaves(out_full["params"]),
                    jax.tree.leaves(out_resumed["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(out_full["moments"].mu),
                               float(out_resumed["moments"].mu), atol=0)
    assert out_full["highest_score"] == out_resumed["highest_score"]


def test_packed_resume_lane_mismatch_falls_back(tmp_path):
    """Changing the lane count invalidates the carry checkpoint; the run
    must fall back to fresh boards (the documented pre-r5 behavior), not
    crash or load a mis-shaped carry."""
    d = tmp_path / "run"
    train(_cfg(d, steps=2, packed=True, lanes=8, horizon=32,
               checkpoint_freq=2))
    out = train(_cfg(d, steps=3, packed=True, lanes=16, horizon=32,
                     resume=True))
    assert out["env_steps_total"] == 1 * 16 * 32  # one resumed step ran


def test_packed_resume_taints_in_flight_episodes(tmp_path):
    """After a carry restore the recorder's lane buffers are empty, so the
    first completion of a lane that was mid-episode at the checkpoint must
    NOT be committed (its prefix would be zero boards). The committed best
    episode must stay internally consistent across a resume."""
    pk = dict(packed=True, lanes=8, horizon=64, checkpoint_freq=2,
              scan_cap=1024)
    d = tmp_path / "run"
    train(_cfg(d, steps=2, **pk))
    out = train(_cfg(d, steps=6, resume=True, **pk))
    ep = out["best_game_episode"]
    if ep is not None and "truncated_at" not in ep:
        # board continuity across every recorded move — a zeroed prefix
        # from a tainted commit would break this immediately
        for m1, m2 in zip(ep["moves"], ep["moves"][1:]):
            assert m1["result_state"] == m2["state_before"]
        assert ep["total_points"] == sum(
            m["points_earned"] for m in ep["moves"])
