"""Standalone evaluation (the reference's ``evaluate`` command is an
unimplemented stub, train.py:1933-1943 — this one works) and batched
best-game search for demo export."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..algo import rollout as R
from ..env import engine
from ..models import MLPConfig, URMConfig, mlp, urm
from . import checkpoint as CKPT
from .loop import fetch_episode


def load_model_checkpoint(path):
    """Load (params, model_config, model_type) from a checkpoint directory
    written by the train loop (best_model.{npz,json})."""
    p = Path(path)
    if p.is_dir():
        name = "best_model" if CKPT.checkpoint_exists(p, "best_model") else "train_state"
        with open(p / f"{name}.json") as f:
            manifest = json.load(f)
        if "model_config" in manifest:  # train_state manifest
            cfg_dict = manifest["model_config"]
            model_type = manifest.get(
                "model_type", manifest.get("config", {}).get("model_type", "mlp")
            )
        else:  # best_model manifest: config IS the model config
            cfg_dict = manifest.get("config", {})
            model_type = manifest.get("model_type", "mlp")
        if model_type == "urm":
            mc = URMConfig(**cfg_dict)
            template = urm.init(jax.random.key(0), mc)
        else:
            mc = MLPConfig(**cfg_dict)
            template = mlp.init(jax.random.key(0), mc)
        if name == "best_model":
            tree, _ = CKPT.load_checkpoint(p, name, dict(params=template))
            return tree["params"], mc, model_type
        # train_state checkpoint: params live under 'params'
        from ..ops import optimizer as opt
        from ..algo.advantage import RtgMoments

        labels = (urm if model_type == "urm" else mlp).param_labels(template)
        full = dict(params=template, opt_state=opt.init(template, labels),
                    moments=RtgMoments.initial(),
                    key=jax.random.key_data(jax.random.key(0)))
        tree, _ = CKPT.load_checkpoint(p, name, full)
        return tree["params"], mc, model_type
    raise FileNotFoundError(f"No checkpoint at {path}")


def _apply_fn(model_cfg, model_type):
    if model_type == "urm":
        return lambda p, x: urm.apply(p, model_cfg, x)
    return lambda p, x: mlp.apply(p, model_cfg, x)


def run_eval(params, model_cfg, model_type, games: int, seed: int = 0,
             max_steps: int = 4096, greedy: bool = False,
             env_seed: int = 12345) -> dict:
    apply_eval = _apply_fn(model_cfg, model_type)

    @jax.jit
    def go(p, key):
        env_key = jax.random.key(env_seed)
        traj = R.rollout(apply_eval, p, key, games, max_steps, env_key=env_key,
                         greedy=greedy)
        tiles = engine.max_tile_value(traj.final_board.astype(jnp.int32))
        return traj.total_points, tiles

    scores, tiles = go(params, jax.random.key(seed))
    scores, tiles = np.asarray(scores), np.asarray(tiles)
    return dict(
        max_score=int(scores.max()),
        avg_score=float(scores.mean()),
        median_score=float(np.sort(scores)[len(scores) // 2]),
        pct_512=float((tiles >= 512).mean() * 100),
        pct_1024=float((tiles >= 1024).mean() * 100),
        pct_2048=float((tiles >= 2048).mean() * 100),
        scores=scores.tolist(),
    )


def load_search_coefs(path):
    """SearchCoefs for expectimax eval, tying search scores to the trained
    objective: reward weights + gamma from the train-state config, and the
    critic denormalization (sigma, mu) from its RTG moments (see
    algo/search.py for the exact Bellman backup). Falls back to pure
    normalized-EV search (critic leaves, terminal masking, no shaping) for
    params-only checkpoints, where the critic's scale is unknown."""
    import zipfile

    from ..algo.search import SearchCoefs

    p = Path(path)
    try:
        with open(p / "train_state.json") as f:
            manifest = json.load(f)
        import numpy as _np

        data = _np.load(p / "train_state.npz")
        mu = float(data["['moments'].mu"])
        m2 = float(data["['moments'].m2"])
        cfg = manifest.get("config", {}) or {}
        beta = float(cfg.get("rtg_beta", 0.99))
        step = int(manifest.get("train_step", 0))
        corr = max(1.0 - beta ** max(step, 1), 1e-8)
        mu_hat = mu / corr
        sigma = float(np.sqrt(max(m2 / corr - mu_hat ** 2, 1e-12)))
        return SearchCoefs(
            points=float(cfg.get("points_weight", 0.1)),
            mono=float(cfg.get("monotonicity_weight", 0.0)),
            empt=float(cfg.get("emptiness_weight", 0.0)),
            sigma=sigma, mu=float(mu_hat),
            gamma=float(cfg.get("gamma", 0.99)))
    except (FileNotFoundError, KeyError, json.JSONDecodeError,
            zipfile.BadZipFile, ValueError, CKPT.CheckpointCorruptError) as e:
        # A corrupted/renamed train_state must NOT silently degrade search
        # (pure-EV leaves cost this checkpoint family ~15k avg at depth 2 —
        # BENCH.md "Math matters"). Loud warning, narrow exception set only;
        # anything else propagates.
        print(f"WARNING: could not load search calibration from {p} "
              f"({type(e).__name__}: {e}); falling back to PURE-EV search "
              f"(uncalibrated critic leaves, no reward shaping) — search "
              f"scores will NOT match the trained objective.",
            file=sys.stderr, flush=True)
        return SearchCoefs()


def _search_play_host(apply_eval, params, n: int, max_steps: int, env_key,
                      coefs, depth: int, prune_k: int):
    """Play ``n`` games with expectimax action selection, the move loop on
    the host: one jitted (score + argmax + step) program per move. Same env
    semantics as ``search_rollout`` (dead lanes keep their final board and
    stop accumulating). Returns (points (n,), final boards (n,4,4))."""
    from functools import partial

    from ..algo import search as SRCH

    @partial(jax.jit, static_argnames=("d", "pk"))
    def one_move(p, boards, alive, points, num_moves, k_spawn, d, pk):
        moves = engine.all_moves(boards)
        scores = SRCH.expectimax_scores(apply_eval, p, boards, moves, coefs,
                                        d, pk)
        action = jnp.argmax(scores, axis=-1)
        res = engine.step(boards, action, k_spawn, moves=moves)
        alive = alive & moves.any_legal
        points = points + jnp.where(alive, res.reward, 0)
        boards = jnp.where(alive[:, None, None], res.board, boards)
        num_moves = num_moves + alive.astype(jnp.int32)
        return boards, alive & ~res.done, points, num_moves

    k_reset, k_env = jax.random.split(env_key)
    boards = engine.reset(k_reset, (n,))
    alive = jnp.ones((n,), jnp.bool_)
    points = jnp.zeros((n,), jnp.int32)
    num_moves = jnp.zeros((n,), jnp.int32)
    t_prev, mv_prev = time.time(), 0
    for mv in range(max_steps):
        k_env, k_spawn = jax.random.split(k_env)
        boards, alive, points, num_moves = one_move(
            params, boards, alive, points, num_moves, k_spawn,
            depth, prune_k)
        alive_h = np.asarray(alive)
        if mv == 0:
            # Move 0 includes the one_move JIT compile (minutes at depth 3);
            # restart the clock so heartbeat ms/move is execution cost.
            t_prev = time.time()
            mv_prev = 1
        if mv % 100 == 99:
            # A depth-3 chunk runs for many minutes with no other output —
            # stderr heartbeat so a watcher (or a timeout post-mortem) can
            # see the loop is advancing and at what per-move cost. ms/move
            # covers the window since the previous heartbeat (steady-state
            # cost, excluding the first move's compile).
            now = time.time()
            print(f"    [search host loop] move {mv + 1}: "
                  f"{int(alive_h.sum())}/{n} alive, "
                  f"avg points so far {float(np.asarray(points).mean()):.0f}, "
                  f"{(now - t_prev) / max(mv + 1 - mv_prev, 1) * 1e3:.0f} "
                  f"ms/move", file=sys.stderr, flush=True)
            t_prev, mv_prev = now, mv + 1
        if not bool(alive_h.any()):
            break
    return points, boards


def run_search_eval(params, model_cfg, model_type, games: int,
                    max_steps: int = 4096, env_seed: int = 12345,
                    coefs=None, depth: int = 1, prune_k: int = 0,
                    bf16: bool = False) -> dict:
    """Expectimax (exact chance nodes, critic leaves) evaluation —
    deterministic given the env stream.

    Games run in bounded chunks: the depth-2 tree materializes
    4*N*32*4*32 ~ 16k*N critic leaves per move, which OOM-crashes the TPU
    worker around N~256 — chunking caps peak memory with no effect on the
    result (each chunk gets its own env stream, folded from ``env_seed``).

    ``prune_k`` bounds the deep fan-out of inner max nodes (top-k by 1-ply
    score, algo/search.py) — the lever that makes depth>=3 tractable.

    depth >= 3 additionally switches from the fully-jitted game loop
    (``search_rollout``) to a HOST-driven move loop over a jitted per-move
    scorer: jitting the whole depth-3 tree (two nested ``lax.map`` sweeps)
    inside the game ``while_loop`` crash-restarts the v5e TPU worker even at
    8 concurrent games — the host loop bounds device-program size per move
    and is deterministic on the same env stream.

    ``bf16=True`` runs the critic leaf forwards in bfloat16 — the same lever
    as rollout's ``expert_bf16`` (leaf evals dominate the tree; bf16 doubles
    their MXU rate at depth 3). Action choice flips only where the top-2
    root scores sit within bf16 noise — near-ties where either move is
    defensible."""
    from ..algo import search as SRCH

    apply_eval = _apply_fn(model_cfg, model_type)
    if bf16:
        _inner = apply_eval
        apply_eval = lambda p, x: _inner(p, x.astype(jnp.bfloat16))
        params = jax.tree.map(
            lambda a: (a.astype(jnp.bfloat16)
                       if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                       else a),
            params)
    chunk = min(games, 256 if depth <= 1 else (32 if depth == 2 else 16))
    scores_l, tiles_l = [], []
    base = jax.random.key(env_seed)
    for i in range(0, games, chunk):
        n = min(chunk, games - i)
        k_chunk = jax.random.fold_in(base, i // chunk)
        c = coefs if coefs is not None else SRCH.SearchCoefs()
        if depth >= 3:
            pts, final = _search_play_host(apply_eval, params, n, max_steps,
                                           k_chunk, c, depth, prune_k)
        else:
            pts, final, _ = SRCH.search_rollout(
                apply_eval, params, n, max_steps, k_chunk,
                coefs=c, depth=depth, prune_k=prune_k)
        scores_l.append(np.asarray(pts))
        tiles_l.append(np.asarray(engine.max_tile_value(final.astype(jnp.int32))))
        done_sc = np.concatenate(scores_l)
        print(f"  [search eval] chunk {i // chunk + 1}/"
              f"{(games + chunk - 1) // chunk} done: {len(done_sc)}/{games} "
              f"games, running avg {done_sc.mean():.0f}, "
              f"max {done_sc.max()}", file=sys.stderr, flush=True)
    scores = np.concatenate(scores_l)
    tiles = np.concatenate(tiles_l)
    return dict(
        max_score=int(scores.max()),
        avg_score=float(scores.mean()),
        median_score=float(np.sort(scores)[len(scores) // 2]),
        pct_512=float((tiles >= 512).mean() * 100),
        pct_1024=float((tiles >= 1024).mean() * 100),
        pct_2048=float((tiles >= 2048).mean() * 100),
        scores=scores.tolist(),
    )


def evaluate_checkpoint(path, games: int = 100, seed: int = 0,
                        greedy: bool = False, env_seed: int = 12345,
                        search: bool = False, search_depth: int = 1,
                        search_prune: int = 0,
                        search_bf16: bool = False) -> dict:
    params, mc, mt = load_model_checkpoint(path)
    print(f"Evaluating model from: {path}")
    print(f"Running {games} evaluation games...")
    if search:
        coefs = load_search_coefs(path)
        prune_note = (f", prune_k={search_prune}" if search_prune else "")
        print(f"Expectimax search eval (depth={search_depth}{prune_note}, "
              f"points={coefs.points:.3g}, mono={coefs.mono:.3g}, "
              f"empt={coefs.empt:.3g}, sigma={coefs.sigma:.3g}, "
              f"mu={coefs.mu:.3g}, gamma={coefs.gamma:.3g})")
        m = run_search_eval(params, mc, mt, games, env_seed=env_seed,
                            coefs=coefs, depth=search_depth,
                            prune_k=search_prune, bf16=search_bf16)
    else:
        m = run_eval(params, mc, mt, games, seed=seed, greedy=greedy,
                     env_seed=env_seed)
    print(f"Eval Results - Max: {m['max_score']}, Avg: {m['avg_score']:.1f}, "
          f"Median: {m['median_score']:.0f}")
    print(f"Tiles Reached - 512: {m['pct_512']:.1f}%, 1024: {m['pct_1024']:.1f}%, "
          f"2048: {m['pct_2048']:.1f}%")
    return m


def search_play_best(params, model_cfg, model_type, num_games: int = 64,
                     env_seed: int = 12345, coefs=None, depth: int = 1,
                     max_steps: int = 4096) -> dict:
    """Play ``num_games`` in lockstep with expectimax action selection and
    return the best episode as the host dict the demo exporter consumes.

    Unlike ``search_rollout`` (fused while_loop, no recording), this drives
    one jitted move at a time from the host so every transition can be
    recorded; the RNG structure mirrors search_rollout's exactly (same
    split order, dead boards frozen), so scores reproduce it move for move.
    Entropy is 0 by convention — search play is deterministic.
    """
    from ..algo import search as SRCH

    apply_eval = _apply_fn(model_cfg, model_type)
    if coefs is None:
        coefs = SRCH.SearchCoefs()

    @jax.jit
    def one_move(p, boards, key, alive):
        key, k_spawn = jax.random.split(key)
        moves = engine.all_moves(boards)
        s = SRCH.expectimax_scores(apply_eval, p, boards, moves,
                                   coefs, depth)
        action = jnp.argmax(s, axis=-1)
        res = engine.step(boards, action, k_spawn, moves=moves)
        step_alive = alive & moves.any_legal
        new_boards = jnp.where(step_alive[:, None, None], res.board, boards)
        reward = jnp.where(step_alive, res.reward, 0)
        return (key, action, new_boards, reward, step_alive,
                step_alive & ~res.done)

    k_reset, key = jax.random.split(jax.random.key(env_seed))
    boards = engine.reset(k_reset, (num_games,))
    alive = jnp.ones((num_games,), jnp.bool_)
    points = np.zeros(num_games, np.int64)
    nmoves = np.zeros(num_games, np.int32)
    recs = []
    for _ in range(max_steps):
        key, action, new_boards, reward, step_alive, alive = one_move(
            params, boards, key, alive)
        sa = np.asarray(step_alive)
        if not sa.any():
            break
        recs.append((np.asarray(boards), np.asarray(action),
                     np.asarray(new_boards), np.asarray(reward), sa))
        points += np.where(sa, np.asarray(reward), 0)
        nmoves += sa
        boards = new_boards

    best = int(points.argmax())
    tiles = np.asarray(engine.max_tile_value(boards.astype(jnp.int32)))
    print(f"Search-played {num_games} games (depth={depth}) — "
          f"avg: {points.mean():.0f}, best: {points[best]}, "
          f"max tile: {int(tiles.max())}")
    moves = [
        {
            "selected_direction": int(a[best]),
            "state_before": b[best].astype(int).tolist(),
            "result_state": nb[best].astype(int).tolist(),
            "points_earned": int(r[best]),
            "entropy": 0.0,
        }
        for (b, a, nb, r, sa) in recs if sa[best]
    ]
    return {
        "moves": moves,
        "total_points": int(points[best]),
        # Reference quirk: total_steps == len(moves) - 1 for naturally
        # ended games (train.py:335-343).
        "total_steps": max(int(nmoves[best]) - 1, 0),
        "final_state": np.asarray(boards[best]).astype(int).tolist(),
    }


def play_best_of(params, model_cfg, model_type, num_games: int = 10,
                 seed: int = 0, max_steps: int = 4096) -> dict:
    """Play a batch and return the best episode as a host dict (for demo
    export; reference export-demo's batched play, train.py:2028-2048)."""
    apply_eval = _apply_fn(model_cfg, model_type)

    @jax.jit
    def go(p, key):
        return R.rollout(apply_eval, p, key, num_games, max_steps)

    traj = go(params, jax.random.key(seed))
    scores = np.asarray(traj.total_points)
    tiles = np.asarray(engine.max_tile_value(jnp.asarray(traj.final_board, jnp.int32)))
    order = np.argsort(scores)[::-1]
    print(f"Played {num_games} games — avg: {scores.mean():.0f}, "
          f"best: {scores[order[0]]}, worst: {scores[order[-1]]}")
    print(f"Max tiles reached: {sorted(set(tiles.tolist()), reverse=True)}")
    return fetch_episode(traj, None, int(order[0]))
