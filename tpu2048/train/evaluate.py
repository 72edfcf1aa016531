"""Standalone evaluation (the reference's ``evaluate`` command is an
unimplemented stub, train.py:1933-1943 — this one works) and batched
best-game search for demo export."""

from __future__ import annotations

import json
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


def load_search_coefs(path) -> tuple[float, float]:
    """(points_coef, value_coef) for expectimax eval, from the train-state
    checkpoint's RTG moments when available (value_coef = gamma * sigma
    denormalizes the critic up to an action-independent constant; see
    algo/search.py). Falls back to pure-EV search (0, 1) for params-only
    checkpoints, where the critic's scale is unknown."""
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
        sigma = float(np.sqrt(max(m2 / corr - (mu / corr) ** 2, 1e-12)))
        gamma = float(cfg.get("gamma", 0.99))
        return float(cfg.get("points_weight", 0.1)), gamma * sigma
    except Exception:
        return 0.0, 1.0


def run_search_eval(params, model_cfg, model_type, games: int,
                    max_steps: int = 4096, env_seed: int = 12345,
                    points_coef: float = 0.0, value_coef: float = 1.0,
                    depth: int = 1) -> dict:
    """Expectimax (exact chance nodes, critic leaves) evaluation —
    deterministic given the env stream."""
    from ..algo import search as SRCH

    apply_eval = _apply_fn(model_cfg, model_type)
    pts, final, _ = SRCH.search_rollout(
        apply_eval, params, games, max_steps, jax.random.key(env_seed),
        points_coef=points_coef, value_coef=value_coef, depth=depth)
    scores = np.asarray(pts)
    tiles = np.asarray(engine.max_tile_value(final.astype(jnp.int32)))
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
                        search: bool = False, search_depth: int = 1) -> dict:
    params, mc, mt = load_model_checkpoint(path)
    print(f"Evaluating model from: {path}")
    print(f"Running {games} evaluation games...")
    if search:
        pc, vc = load_search_coefs(path)
        print(f"Expectimax search eval (depth={search_depth}, "
              f"points_coef={pc:.3g}, value_coef={vc:.3g})")
        m = run_search_eval(params, mc, mt, games, env_seed=env_seed,
                            points_coef=pc, value_coef=vc,
                            depth=search_depth)
    else:
        m = run_eval(params, mc, mt, games, seed=seed, greedy=greedy,
                     env_seed=env_seed)
    print(f"Eval Results - Max: {m['max_score']}, Avg: {m['avg_score']:.1f}, "
          f"Median: {m['median_score']:.0f}")
    print(f"Tiles Reached - 512: {m['pct_512']:.1f}%, 1024: {m['pct_1024']:.1f}%, "
          f"2048: {m['pct_2048']:.1f}%")
    return m


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
