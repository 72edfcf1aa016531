"""Packed-mode best-episode capture (tpu2048/algo/capture.py).

Packed lanes hold episodes that span chunk boundaries, so the train loop
cannot slice a best episode out of any single chunk's (T, N) buffers
(VERDICT r4 item 3); the on-device recorder accumulates it instead. These
tests drive rollout_packed with a recorder over several chunks and check
the committed episode is exactly the best completed one, move for move.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.algo import capture, rollout as R
from tpu2048.env import engine
from tpu2048.models import MLPConfig, mlp


def _run_chunks(lanes=16, horizon=64, chunks=6, cap=2048, seed=0):
    cfg = MLPConfig(hidden_dim=32, num_layers=1)
    params = mlp.init(jax.random.key(7), cfg, zero_heads=False)
    apply_fn = lambda p, x: mlp.apply(p, cfg, x)

    carry = R.init_env_carry(jax.random.key(seed), lanes)
    rec = capture.init_recorder(lanes, cap)
    f = jax.jit(lambda p, k, c, r: R.rollout_packed(
        apply_fn, p, k, c, horizon, recorder=r))

    completions = []  # (score, length) of every completed episode
    key = jax.random.key(seed + 1)
    for _ in range(chunks):
        key, k = jax.random.split(key)
        traj, carry, rec = f(params, k, carry, rec)
        done = np.asarray(traj.done_here)
        scores = np.asarray(traj.ep_score)
        lens = np.asarray(traj.ep_len)
        for t, n in zip(*np.nonzero(done)):
            completions.append((int(scores[t, n]), int(lens[t, n])))
    return rec, completions


def test_best_score_matches_completions():
    rec, completions = _run_chunks()
    assert completions, "no episodes completed — lengthen the run"
    best = max(completions)
    assert int(rec.best_score) == best[0]
    # the committed length belongs to SOME completion with that score
    lens = {l for s, l in completions if s == best[0]}
    assert int(rec.best_true_len) in lens
    assert int(rec.best_len) == min(int(rec.best_true_len), rec.best_action.shape[0])


def test_recorded_episode_is_internally_consistent():
    rec, _ = _run_chunks()
    n = int(rec.best_len)
    assert n > 0
    assert int(rec.best_true_len) == n, "raise cap: best episode truncated"
    before = np.asarray(rec.best_before[:n]).astype(np.int32)
    after = np.asarray(rec.best_after[:n]).astype(np.int32)
    action = np.asarray(rec.best_action[:n]).astype(np.int32)
    points = np.asarray(rec.best_points[:n]).astype(np.int32)

    # Points sum to the committed score.
    assert points.sum() == int(rec.best_score)

    # Board continuity: each move's after-board is the next move's before.
    np.testing.assert_array_equal(after[:-1], before[1:])

    # Each transition is a legal engine move: the pre-spawn merge of
    # before[t] under action[t] must equal after[t] minus exactly one
    # spawned tile (exponent 1 or 2) on a cell that was empty post-merge —
    # except the terminal move, where no tile spawns iff the board is full.
    moves = jax.jit(engine.all_moves)(jnp.asarray(before))
    merged = np.asarray(moves.boards)[action, np.arange(n)]
    rew = np.asarray(moves.preview_rewards)[np.arange(n), action]
    np.testing.assert_array_equal(rew, points)
    diff_counts = (merged != after).sum(axis=(1, 2))
    for t in range(n):
        d = int(diff_counts[t])
        if d == 0:
            continue  # terminal move on a full board: no spawn slot
        assert d == 1, f"move {t}: {d} cells differ post-merge"
        r, c = np.argwhere(merged[t] != after[t])[0]
        assert merged[t][r, c] == 0 and after[t][r, c] in (1, 2)

    # The last recorded board is terminal (no legal move remains).
    last = jnp.asarray(after[-1:])
    mask = np.asarray(jax.jit(engine.all_moves)(last).action_mask)
    assert mask.all(), "committed episode does not end on a terminal board"


def test_recorder_survives_empty_chunks():
    # A chunk with no completions must leave the committed episode intact.
    rec, completions = _run_chunks(chunks=2, horizon=16)
    if not completions:
        assert int(rec.best_score) == 0
        assert int(rec.best_len) == 0


def test_truncation_marks_true_length():
    rec, completions = _run_chunks(cap=8, horizon=64, chunks=4)
    assert completions
    best_score, _ = max(completions)
    assert int(rec.best_score) == best_score
    if int(rec.best_true_len) > 8:
        assert int(rec.best_len) == 8
