"""Packed (auto-reset) rollout — the throughput mode (VERDICT r3 item 2;
SURVEY.md §7.1 planned "reset, step ... with auto-reset" from the start).

Covers: step-record invariants and board continuity across resets and chunk
boundaries, segment bookkeeping (episode scores/lengths/tiles at completion
records), the segment-aware bootstrapped returns-to-go against a plain-Python
backward pass, equivalence of compute_packed with the exact-episode pipeline
when segments are whole, and end-to-end training through the public
TrainConfig path (single-"chip" and SPMD mesh on the virtual CPU devices).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.algo import advantage as A
from tpu2048.algo import rollout as R
from tpu2048.env import engine
from tpu2048.models import MLPConfig, mlp

LANES, STEPS = 8, 256  # long enough that several games end and reset


@pytest.fixture(scope="module")
def model():
    cfg = MLPConfig(hidden_dim=32, num_layers=1)
    params = mlp.init(jax.random.key(3), cfg, zero_heads=False)
    return params, (lambda p, x: mlp.apply(p, cfg, x))


@pytest.fixture(scope="module")
def packed(model):
    params, apply_fn = model
    carry0 = R.init_env_carry(jax.random.key(11), LANES)
    f = jax.jit(lambda p, k, c: R.rollout_packed(apply_fn, p, k, c, STEPS))
    traj, carry1 = f(params, jax.random.key(1), carry0)
    traj2, carry2 = f(params, jax.random.key(2), carry1)
    return carry0, traj, carry1, traj2, carry2


def test_every_step_is_a_real_move(packed):
    _, traj, *_ = packed
    assert bool(np.asarray(traj.valid).all())
    assert int(traj.steps_executed) == STEPS
    # every recorded action was legal on its board
    mask = np.asarray(traj.action_mask)  # True = invalid
    act = np.asarray(traj.action).astype(int)
    taken_invalid = np.take_along_axis(mask, act[..., None], axis=-1)
    assert not taken_invalid.any()


def test_board_continuity_and_reset(packed):
    _, traj, *_ = packed
    bb = np.asarray(traj.board_before).astype(int)
    ba = np.asarray(traj.board_after).astype(int)
    dh = np.asarray(traj.done_here)
    assert dh.any(), "no episode ended — the reset path was not exercised"
    cont = ba[:-1] == bb[1:]  # (T-1, N, 4, 4)
    cont_ok = cont.all(axis=(-1, -2))
    # non-terminal steps: board flows through unchanged
    assert cont_ok[~dh[:-1]].all()
    # terminal steps: the next board is a fresh 2-tile reset (sum of two
    # spawned exponents, each 1 or 2)
    fresh_sums = bb[1:][dh[:-1]].sum(axis=(-1, -2))
    assert fresh_sums.min() >= 2 and fresh_sums.max() <= 4
    assert ((bb[1:][dh[:-1]] != 0).sum(axis=(-1, -2)) == 2).all()


def test_segment_bookkeeping(packed):
    carry0, traj, carry1, *_ = packed
    pts = np.asarray(traj.points).astype(int)
    dh = np.asarray(traj.done_here)
    ep_score = np.asarray(traj.ep_score).astype(int)
    ep_len = np.asarray(traj.ep_len).astype(int)
    ep_start = np.asarray(traj.ep_start)
    ep_tile = np.asarray(traj.ep_tile).astype(int)
    ba = np.asarray(traj.board_after).astype(int)

    run_pts = np.asarray(carry0.ep_points).astype(int).copy()
    run_len = np.asarray(carry0.ep_moves).astype(int).copy()
    for t in range(STEPS):
        run_pts += pts[t]
        run_len += 1
        # ep_start marks the first move of a fresh episode
        np.testing.assert_array_equal(ep_start[t], run_len == 1)
        for n in range(LANES):
            if dh[t, n]:
                assert ep_score[t, n] == run_pts[n]
                assert ep_len[t, n] == run_len[n]
                assert ep_tile[t, n] == 2 ** ba[t, n].max()
                run_pts[n] = 0
                run_len[n] = 0
            else:
                assert ep_score[t, n] == 0 and ep_len[t, n] == 0
    # the carry-out accumulators hold the trailing partial segments
    np.testing.assert_array_equal(np.asarray(carry1.ep_points), run_pts)
    np.testing.assert_array_equal(np.asarray(carry1.ep_moves), run_len)


def test_chunk_boundary_continuity(packed):
    _, _, carry1, traj2, _ = packed
    np.testing.assert_array_equal(
        np.asarray(carry1.boards).astype(np.int8),
        np.asarray(traj2.board_before)[0],
    )


def test_returns_to_go_packed_matches_python():
    rng = np.random.default_rng(0)
    T, N, gamma = 17, 5, 0.97
    r = rng.normal(size=(T, N)).astype(np.float32)
    d = rng.random((T, N)) < 0.2
    boot = rng.normal(size=(N,)).astype(np.float32)

    got = np.asarray(A.returns_to_go_packed(
        jnp.asarray(r), jnp.asarray(d), gamma, jnp.asarray(boot)))

    want = np.zeros_like(r)
    for n in range(N):
        G = boot[n]
        for t in reversed(range(T)):
            G = r[t, n] + gamma * (0.0 if d[t, n] else G)
            want[t, n] = G
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_compute_packed_equals_exact_on_whole_episodes():
    """When every lane's chunk holds exactly one episode that terminates at
    the last step, the packed pipeline (bootstrap never used, no interior
    resets) must reproduce the exact-episode pipeline bit for bit."""
    rng = np.random.default_rng(1)
    T, N = 12, 4
    pts = jnp.asarray(rng.integers(0, 20, (T, N)), jnp.int32)
    mono_b = jnp.asarray(rng.integers(0, 9, (T, N)), jnp.int32)
    mono_a = jnp.asarray(rng.integers(0, 9, (T, N)), jnp.int32)
    empt_b = jnp.asarray(rng.integers(0, 16, (T, N)), jnp.int32)
    empt_a = jnp.asarray(rng.integers(0, 16, (T, N)), jnp.int32)
    vp = jnp.asarray(rng.normal(size=(T, N)), jnp.float32)
    valid = jnp.ones((T, N), jnp.bool_)
    done = jnp.zeros((T, N), jnp.bool_).at[-1].set(True)
    boot = jnp.asarray(rng.normal(size=(N,)), jnp.float32)  # must be ignored

    w = A.RewardWeights(points=0.1, monotonicity=1.0, emptiness=0.3)
    m = A.RtgMoments.initial()
    exact = A.compute(pts, mono_b, mono_a, empt_b, empt_a, vp, valid,
                      w, 0.99, m, 0.9, 5)
    packed = A.compute_packed(pts, mono_b, mono_a, empt_b, empt_a, vp,
                              valid, done, boot, w, 0.99, m, 0.9, 5)
    for k in ("reward", "G_raw", "G_norm", "advantage"):
        np.testing.assert_allclose(np.asarray(exact[k]), np.asarray(packed[k]),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(exact["new_moments"].mu),
                               np.asarray(packed["new_moments"].mu))


def test_bootstrap_denormalization_round_trip():
    """The bootstrap must invert the normalization exactly: a critic that
    predicts V_norm for the cut state contributes mu + (std+eps)*V_norm of
    raw return, so G_norm at a cut-only segment equals gamma^k-discounted
    V_norm (up to reward terms)."""
    T, N = 3, 2
    zeros = jnp.zeros((T, N), jnp.int32)
    vp = jnp.zeros((T, N), jnp.float32)
    valid = jnp.ones((T, N), jnp.bool_)
    done = jnp.zeros((T, N), jnp.bool_)
    boot = jnp.asarray([1.5, -0.75], jnp.float32)
    w = A.RewardWeights()
    # moments with known scale: mu=2, m2=2^2+3^2 -> corrected at huge step
    m = A.RtgMoments(jnp.float32(2.0), jnp.float32(13.0), jnp.float32(2.0))
    out = A.compute_packed(zeros, zeros, zeros, zeros, zeros, vp, valid,
                           done, boot, w, 1.0, m, 0.5, 1000)
    # gamma=1, zero rewards: G_raw = mu + (std+eps)*boot everywhere;
    # G_norm = (G_raw - mu)/(std+eps) = boot
    np.testing.assert_allclose(np.asarray(out["G_norm"][0]),
                               np.asarray(boot), rtol=1e-5, atol=1e-5)


def _run_train(tmp_path, **overrides):
    from tpu2048.train.loop import TrainConfig, train

    kwargs = dict(
        steps=3, packed=True, lanes=8, horizon=32, batch_size=64,
        points_weight=0.1, monotonicity_weight=1.0,
        checkpoint_dir=str(tmp_path / "ck"), log_dir=str(tmp_path / "logs"),
        print_frequency=2, warmup_steps=1,
    )
    kwargs.update(overrides)
    return train(TrainConfig(**kwargs))


def test_packed_training_end_to_end(tmp_path):
    out = _run_train(tmp_path)
    assert out["env_steps_total"] == 3 * 8 * 32  # 100% occupancy, exactly
    assert np.isfinite(np.asarray(
        jax.tree.leaves(out["params"])[0])).all()


def test_packed_training_spmd_mesh(tmp_path):
    """The same packed program over a data mesh (virtual CPU devices)."""
    out = _run_train(tmp_path, mesh_data=4, lanes=16)
    assert out["env_steps_total"] == 3 * 16 * 32


def test_packed_rejects_expert_iter(tmp_path):
    with pytest.raises(ValueError, match="expert"):
        _run_train(tmp_path, expert_iter=True)


def test_packed_capture_feeds_viz_and_demo(tmp_path):
    """VERDICT r4 item 3: a packed run must produce the same best-episode
    artifacts exact mode does — viz JSONs and a demo-exportable episode —
    via the device-side recorder (episodes span chunks; algo/capture.py)."""
    viz = tmp_path / "viz"
    out = _run_train(tmp_path, steps=5, horizon=64, viz_dir=str(viz),
                     print_frequency=2)
    ep = out["best_game_episode"]
    assert ep is not None, "no episode captured in 5x64-step packed chunks"
    assert ep["total_points"] == sum(m["points_earned"] for m in ep["moves"])
    assert ep["total_steps"] == len(ep["moves"]) - 1  # reference accounting
    assert ep["final_state"] == ep["moves"][-1]["result_state"]
    # mono/empt recomputed at fetch time; terminal step zeroed
    assert ep["moves"][-1]["monotonicity_after"] == 0.0
    assert ep["moves"][-1]["emptiness_after"] == 0.0
    files = list(viz.glob("step_*.json"))
    assert files, "packed run wrote no viz JSONs"
    import json as _json

    data = _json.loads(files[0].read_text())
    assert data["moves"], "viz JSON has no moves"


def test_packed_capture_off_keeps_old_gating(tmp_path):
    out = _run_train(tmp_path, packed_capture=False)
    assert out["best_game_episode"] is None
