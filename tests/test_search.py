"""Expectimax search eval (algo/search.py): exactness of the shaped Bellman
backup vs plain-Python brute force (chance-node expectation, terminal-child
zeroing, PBRS after-potential, critic denormalization, depth-2 recursion),
legality masking, and the end-to-end search rollout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.algo import search as SRCH
from tpu2048.algo.search import SearchCoefs
from tpu2048.env import engine, heuristics as H
from tpu2048.models import MLPConfig, mlp
from tpu2048.models.encoding import encode_boards

# Nontrivial coefficients so every term of the backup is exercised.
COEFS = SearchCoefs(points=0.1, mono=0.7, empt=0.3, sigma=2.5, mu=-0.4,
                    gamma=0.97)


@pytest.fixture(scope="module")
def model():
    cfg = MLPConfig(hidden_dim=32, num_layers=1)
    params = mlp.init(jax.random.key(5), cfg, zero_heads=False)
    return params, (lambda p, x: mlp.apply(p, cfg, x))


def _phi(board, coefs):
    b = jnp.asarray(board, jnp.int32)[None]
    return (coefs.mono * float(H.monotonicity(b)[0])
            + coefs.empt * float(H.emptiness(b)[0]))


def _alive(board):
    return bool(engine.all_moves(jnp.asarray(board, jnp.int32)[None])
                .any_legal[0])


def _brute_force_scores(apply_fn, params, board, coefs):
    """Reference enumeration with plain Python loops:
    score(a) = points*pts + gamma*E_spawn[alive * (phi(merged) + sigma*V+mu)].
    """
    moves = engine.all_moves(jnp.asarray(board, jnp.int32)[None])
    out = np.full(4, -np.inf)
    for d in range(4):
        if not bool(moves.legal[d, 0]):
            continue
        merged = np.asarray(moves.boards[d, 0])
        phi_m = _phi(merged, coefs)
        empties = [(r, c) for r in range(4) for c in range(4)
                   if merged[r, c] == 0]
        ev = 0.0
        for (r, c) in empties:
            for exp, pr in ((1, 0.9), (2, 0.1)):
                child = merged.copy()
                child[r, c] = exp
                if _alive(child):
                    _, v = apply_fn(params,
                                    encode_boards(jnp.asarray(child)[None]))
                    contrib = phi_m + coefs.sigma * float(v[0, 0]) + coefs.mu
                else:
                    contrib = 0.0  # game over: reward shaping + return vanish
                ev += pr / len(empties) * contrib
        out[d] = coefs.points * float(moves.scores[d, 0]) + coefs.gamma * ev
    return out


def test_expectimax_matches_brute_force(model):
    params, apply_fn = model
    rng = np.random.default_rng(0)
    boards = jnp.asarray(rng.integers(0, 6, (5, 4, 4)), jnp.int32)
    got = np.asarray(
        SRCH.expectimax_scores(apply_fn, params, boards, coefs=COEFS))
    for i in range(boards.shape[0]):
        want = _brute_force_scores(apply_fn, params, boards[i], COEFS)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_terminal_children_valued_zero(model):
    """A nearly-full checkerboard where some spawns end the game: the dead
    children must contribute 0, not critic extrapolation."""
    params, apply_fn = model
    board = jnp.asarray([[[1, 2, 3, 4],
                          [5, 6, 7, 8],
                          [9, 10, 11, 12],
                          [13, 14, 15, 0]]], jnp.int32)
    got = np.asarray(
        SRCH.expectimax_scores(apply_fn, params, board[0][None], coefs=COEFS))
    want = _brute_force_scores(apply_fn, params, board[0], COEFS)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)
    # And at least one child of this board really is terminal.
    moves = engine.all_moves(board)
    any_dead = False
    for d in range(4):
        if not bool(moves.legal[d, 0]):
            continue
        merged = np.asarray(moves.boards[d, 0])
        for (r, c) in [(r, c) for r in range(4) for c in range(4)
                       if merged[r, c] == 0]:
            for exp in (1, 2):
                child = merged.copy()
                child[r, c] = exp
                any_dead |= not _alive(child)
    assert any_dead


def test_expectimax_masks_illegal(model):
    params, apply_fn = model
    # A board where LEFT is illegal (everything already flush left, no merges).
    board = jnp.asarray([[[1, 2, 3, 4],
                          [2, 3, 4, 5],
                          [3, 4, 5, 6],
                          [4, 5, 6, 7]]], jnp.int32)
    moves = engine.all_moves(board)
    scores = np.asarray(
        SRCH.expectimax_scores(apply_fn, params, board))
    legal = np.asarray(moves.legal)[:, 0]
    assert (scores[0, ~legal] == -np.inf).all()
    assert np.isfinite(scores[0, legal]).all()


def test_search_rollout_completes(model):
    params, apply_fn = model
    pts, final, nm = SRCH.search_rollout(
        apply_fn, params, 8, 300, jax.random.key(3))
    pts, nm = np.asarray(pts), np.asarray(nm)
    assert (pts >= 0).all() and (nm > 0).all()
    # Deterministic given the env stream.
    pts2, _, _ = SRCH.search_rollout(apply_fn, params, 8, 300, jax.random.key(3))
    np.testing.assert_array_equal(pts, np.asarray(pts2))


def _brute_force_depth2(apply_fn, params, board, coefs):
    """Exact 2-ply expectimax with plain Python loops: each live spawn child
    is valued by its own best 1-ply action score minus phi(child) (the state
    value re-adds the constant the action scores drop); terminal children 0."""
    moves = engine.all_moves(jnp.asarray(board, jnp.int32)[None])
    out = np.full(4, -np.inf)
    for d in range(4):
        if not bool(moves.legal[d, 0]):
            continue
        merged = np.asarray(moves.boards[d, 0])
        phi_m = _phi(merged, coefs)
        empties = [(r, c) for r in range(4) for c in range(4)
                   if merged[r, c] == 0]
        ev = 0.0
        for (r, c) in empties:
            for exp, pr in ((1, 0.9), (2, 0.1)):
                child = merged.copy()
                child[r, c] = exp
                if _alive(child):
                    sv = float(np.max(_brute_force_scores(
                        apply_fn, params, jnp.asarray(child, jnp.int32),
                        coefs))) - _phi(child, coefs)
                    contrib = phi_m + sv
                else:
                    contrib = 0.0
                ev += pr / len(empties) * contrib
        out[d] = coefs.points * float(moves.scores[d, 0]) + coefs.gamma * ev
    return out


def test_expectimax_depth2_matches_brute_force(model):
    params, apply_fn = model
    rng = np.random.default_rng(7)
    boards = jnp.asarray(rng.integers(0, 6, (3, 4, 4)), jnp.int32)
    got = np.asarray(
        SRCH.expectimax_scores(apply_fn, params, boards, coefs=COEFS,
                               depth=2))
    for i in range(boards.shape[0]):
        want = _brute_force_depth2(apply_fn, params, boards[i], COEFS)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_pruned_state_values_bound_and_agreement(model):
    """Pruned state value = max over the deep scores of the shallow top-k
    actions: always <= the exact value, and EQUAL whenever the exact argmax
    action is inside the shallow top-k."""
    params, apply_fn = model
    rng = np.random.default_rng(11)
    boards = jnp.asarray(rng.integers(0, 6, (6, 4, 4)), jnp.int32)
    k = 2

    exact_v, alive = SRCH.state_values(apply_fn, params, boards, COEFS, 2)
    pruned_v, alive_p = SRCH.state_values(apply_fn, params, boards, COEFS, 2,
                                          prune_k=k)
    np.testing.assert_array_equal(np.asarray(alive), np.asarray(alive_p))
    exact_v, pruned_v = np.asarray(exact_v), np.asarray(pruned_v)
    assert (pruned_v <= exact_v + 1e-4).all()

    deep = np.asarray(SRCH.expectimax_scores(apply_fn, params, boards,
                                             coefs=COEFS, depth=2))
    shallow = np.asarray(SRCH.expectimax_scores(apply_fn, params, boards,
                                                coefs=COEFS, depth=1))
    hit = 0
    for i in range(boards.shape[0]):
        if not alive[i]:
            continue
        topk = np.argsort(-shallow[i])[:k]
        if int(np.argmax(deep[i])) in topk:
            np.testing.assert_allclose(pruned_v[i], exact_v[i],
                                       rtol=1e-4, atol=1e-5)
            hit += 1
    assert hit > 0  # the agreement branch was actually exercised


def test_depth3_root_is_chance_average_of_pruned_depth2(model):
    """Depth-3 pruned root scores == points*pts + gamma * E_spawn over live
    children of (phi(merged) + pruned depth-2 state value) — the recursion
    plumbing, verified against a plain-Python chance-node enumeration whose
    children are valued by state_values itself."""
    params, apply_fn = model
    rng = np.random.default_rng(23)
    board = jnp.asarray(rng.integers(0, 7, (4, 4)), jnp.int32)
    k = 2

    got = np.asarray(SRCH.expectimax_scores(
        apply_fn, params, board[None], coefs=COEFS, depth=3, prune_k=k))[0]

    moves = engine.all_moves(board[None])
    want = np.full(4, -np.inf)
    for d in range(4):
        if not bool(moves.legal[d, 0]):
            continue
        merged = np.asarray(moves.boards[d, 0])
        phi_m = _phi(merged, COEFS)
        empties = [(r, c) for r in range(4) for c in range(4)
                   if merged[r, c] == 0]
        ev = 0.0
        for (r, c) in empties:
            for exp, pr in ((1, 0.9), (2, 0.1)):
                child = merged.copy()
                child[r, c] = exp
                sv, al = SRCH.state_values(
                    apply_fn, params, jnp.asarray(child, jnp.int32)[None],
                    COEFS, 2, prune_k=k)
                contrib = (phi_m + float(sv[0])) if bool(al[0]) else 0.0
                ev += pr / len(empties) * contrib
        want[d] = COEFS.points * float(moves.scores[d, 0]) + COEFS.gamma * ev
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_search_rollout_depth3_pruned_completes(model):
    params, apply_fn = model
    pts, final, nm = SRCH.search_rollout(
        apply_fn, params, 1, 6, jax.random.key(9), coefs=COEFS, depth=3,
        prune_k=2)
    assert int(nm[0]) > 0 and int(pts[0]) >= 0


def test_host_search_play_matches_jitted_rollout(model):
    """_search_play_host (the depth>=3 eval driver: host move loop over a
    jitted per-move scorer) must reproduce search_rollout's games exactly on
    the same env stream — same per-game points and final boards."""
    from tpu2048.train.evaluate import _search_play_host

    params, apply_fn = model
    key = jax.random.key(42)
    pts_j, final_j, _ = SRCH.search_rollout(
        apply_fn, params, 4, 64, key, coefs=COEFS, depth=1)
    pts_h, final_h = _search_play_host(
        apply_fn, params, 4, 64, key, COEFS, depth=1, prune_k=0)
    np.testing.assert_array_equal(np.asarray(pts_j), np.asarray(pts_h))
    np.testing.assert_array_equal(np.asarray(final_j), np.asarray(final_h))


def test_load_search_coefs_calibrated_from_real_checkpoint():
    """The committed expA train_state must yield calibrated coefs (the
    'Math matters' fix in BENCH.md depends on sigma/mu/shaping being read)."""
    from tpu2048.train.evaluate import load_search_coefs

    coefs = load_search_coefs("checkpoints_expA")
    assert coefs.sigma != 1.0 or coefs.mu != 0.0, "fell back to pure-EV"
    assert coefs.mono > 0.0  # expA trained with mono PBRS on


def test_load_search_coefs_fallback_warns(tmp_path, capsys):
    """Missing or corrupted train_state falls back to pure-EV coefs with a
    LOUD stderr warning — never silently (VERDICT r3 weak #5)."""
    from tpu2048.algo.search import SearchCoefs
    from tpu2048.train.evaluate import load_search_coefs

    # Missing checkpoint entirely.
    coefs = load_search_coefs(tmp_path)
    assert coefs == SearchCoefs()
    err = capsys.readouterr().err
    assert "WARNING" in err and "PURE-EV" in err.upper()

    # Valid manifest but corrupted npz payload.
    (tmp_path / "train_state.json").write_text('{"config": {}}')
    (tmp_path / "train_state.npz").write_bytes(b"not a zip archive")
    coefs = load_search_coefs(tmp_path)
    assert coefs == SearchCoefs()
    assert "WARNING" in capsys.readouterr().err


def test_load_search_coefs_unexpected_error_propagates(tmp_path, monkeypatch):
    """Only the narrow known-corruption set is swallowed; programming errors
    must surface."""
    import pytest

    from tpu2048.train import evaluate as EV

    (tmp_path / "train_state.json").write_text('{"config": {}}')

    def boom(*a, **k):
        raise RuntimeError("unexpected")

    monkeypatch.setattr(EV.json, "load", boom)
    with pytest.raises(RuntimeError, match="unexpected"):
        EV.load_search_coefs(tmp_path)


def test_run_search_eval_bf16_close_to_fp32():
    """--search-bf16 (round 5): bfloat16 critic leaves give the same eval
    within near-tie noise on a short fixed-stream run — same env stream,
    deterministic action argmax, so any drift is bf16 score reordering."""
    from tpu2048.train.evaluate import run_search_eval

    mc = MLPConfig(hidden_dim=32, num_layers=1)
    params = mlp.init(jax.random.key(5), mc, zero_heads=False)
    a = run_search_eval(params, mc, "mlp", games=4, max_steps=80,
                        env_seed=99, depth=1)
    b = run_search_eval(params, mc, "mlp", games=4, max_steps=80,
                        env_seed=99, depth=1, bf16=True)
    # identical env stream; scores agree unless a near-tie flipped a move
    ra, rb = np.asarray(a["scores"]), np.asarray(b["scores"])
    assert (ra == rb).mean() >= 0.5, (ra, rb)
    assert abs(a["avg_score"] - b["avg_score"]) / max(a["avg_score"], 1) < 0.5
