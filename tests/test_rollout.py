"""Fused-rollout invariants vs the oracle (reference play_game_for_episode
semantics, train.py:213-345)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu2048.algo import rollout as R
from tpu2048.env import oracle
from tpu2048.models import MLPConfig, mlp

CFG = MLPConfig(hidden_dim=32, num_layers=1)
PARAMS = mlp.init(jax.random.key(0), CFG)  # zero heads -> uniform policy
APPLY = lambda p, x: mlp.apply(p, CFG, x)

N, T = 8, 256
TRAJ = jax.jit(lambda p, k: R.rollout(APPLY, p, k, N, T))(PARAMS, jax.random.key(1))


def _g(x):
    return np.asarray(x)


def test_episodes_complete():
    ended = _g(TRAJ.ended)
    assert ended.all()  # random play ends well before 256 moves
    assert (_g(TRAJ.num_moves) > 20).all()
    assert (_g(TRAJ.total_steps) == _g(TRAJ.num_moves) - 1).all()


def test_valid_mask_is_prefix():
    valid = _g(TRAJ.valid)
    for i in range(N):
        n = _g(TRAJ.num_moves)[i]
        assert valid[:n, i].all() and not valid[n:, i].any()


def test_transitions_match_oracle():
    valid = _g(TRAJ.valid)
    bb, ba = _g(TRAJ.board_before), _g(TRAJ.board_after)
    act, pts = _g(TRAJ.action), _g(TRAJ.points)
    maxc = _g(TRAJ.max_created)
    for i in range(N):
        n = _g(TRAJ.num_moves)[i]
        for t in range(n):
            grid = [list(map(int, r)) for r in bb[t, i]]
            d = int(act[t, i])
            assert oracle.direction_is_legal(grid, d), (t, i)
            moved, score, mx = oracle.simulate_move(grid, d)
            assert pts[t, i] == score
            assert maxc[t, i] == mx
            # board_after = moved + one spawned tile
            diff = ba[t, i].astype(int) - np.asarray(moved)
            changed = np.argwhere(diff != 0)
            assert len(changed) == 1
            r, c = changed[0]
            assert moved[r][c] == 0 and ba[t, i, r, c] in (1, 2)
            # chain: next board_before continues from board_after
            if t + 1 < n:
                assert (bb[t + 1, i] == ba[t, i]).all()
        # final board recorded
        assert (_g(TRAJ.final_board)[i] == ba[n - 1, i]).all()
        # terminal: final board has no legal moves
        fgrid = [list(map(int, r)) for r in ba[n - 1, i]]
        assert not oracle.has_next_step(fgrid)


def test_action_masks_and_logprobs():
    valid, bb = _g(TRAJ.valid), _g(TRAJ.board_before)
    mask, lps = _g(TRAJ.action_mask), _g(TRAJ.logprobs)
    for i in range(2):
        n = _g(TRAJ.num_moves)[i]
        for t in range(0, n, 17):
            grid = [list(map(int, r)) for r in bb[t, i]]
            legal = oracle.legal_directions(grid)
            assert mask[t, i].tolist() == [d not in legal for d in range(4)]
            # zero-head params -> uniform over legal actions
            probs = np.exp(lps[t, i])
            expect = np.asarray([1.0 / len(legal) if d in legal else 0.0 for d in range(4)])
            np.testing.assert_allclose(probs, expect, atol=1e-5)


def test_totals_and_potentials():
    pts, valid = _g(TRAJ.points), _g(TRAJ.valid)
    np.testing.assert_array_equal(
        (pts * valid).sum(0), _g(TRAJ.total_points)
    )
    # terminal step zeroing (train.py:318-322)
    done = _g(TRAJ.done_here)
    assert (_g(TRAJ.mono_after)[done] == 0).all()
    assert (_g(TRAJ.empt_after)[done] == 0).all()
    # potentials match the heuristics on recorded boards (spot check)
    from tpu2048.env import heuristics as H

    i, t = 0, 5
    b = jnp.asarray(_g(TRAJ.board_before)[t, i], jnp.int32)[None]
    assert int(jax.jit(H.monotonicity)(b)[0]) == _g(TRAJ.mono_before)[t, i]
    assert int(jax.jit(H.emptiness)(b)[0]) == _g(TRAJ.empt_before)[t, i]


def test_determinism_and_env_key_split():
    f = jax.jit(lambda p, k, ek: R.rollout(APPLY, p, k, 4, 64, env_key=ek))
    k, ek = jax.random.key(5), jax.random.key(6)
    t1 = f(PARAMS, k, ek)
    t2 = f(PARAMS, k, ek)
    np.testing.assert_array_equal(_g(t1.total_points), _g(t2.total_points))
    # same env stream, different policy stream -> same initial boards
    t3 = f(PARAMS, jax.random.key(7), ek)
    np.testing.assert_array_equal(
        _g(t1.board_before)[0], _g(t3.board_before)[0]
    )
    # different env stream -> different initial boards
    t4 = f(PARAMS, k, jax.random.key(8))
    assert (_g(t1.board_before)[0] != _g(t4.board_before)[0]).any()


def test_expert_bf16_labels_agree_on_decisive_states():
    """expert_bf16 halves leaf-eval cost; its labels must agree with the f32
    expert except on near-tie states (whose target gap is ~0 anyway)."""
    params = mlp.init(jax.random.key(3), CFG, zero_heads=False)
    kw = dict(expert_depth=1, expert_mix=0.5, expert_tau=0.02)
    f32 = jax.jit(lambda p, k: R.rollout(APPLY, p, k, N, T, **kw))(
        params, jax.random.key(7))
    b16 = jax.jit(lambda p, k: R.rollout(APPLY, p, k, N, T, **kw,
                                         expert_bf16=True))(
        params, jax.random.key(7))
    assert _g(b16.ended).all()
    assert np.isfinite(_g(b16.target_probs)).all()

    # Compare step-by-step while both trajectories traverse the same states
    # (they diverge once a bf16 label flip changes an expert-driven env's
    # move). Decisive agreement is checked on the f32 target gap.
    v = _g(f32.valid) & _g(b16.valid)
    same_state = (_g(f32.board_before) == _g(b16.board_before)).all(-1).all(-1)
    m = v & same_state
    assert m.sum() > 100
    ta_f, ta_b = _g(f32.target_action), _g(b16.target_action)
    tp = _g(f32.target_probs)
    top2 = np.sort(tp, axis=-1)[..., ::-1]
    gap = top2[..., 0] - top2[..., 1]
    decisive = m & (gap > 0.2)
    assert decisive.sum() > 20
    agree = (ta_f == ta_b)[decisive].mean()
    assert agree > 0.97, agree
