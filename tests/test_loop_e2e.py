"""End-to-end train-loop tests: tiny runs exercising rollout -> advantage ->
augment -> PPO -> stats -> eval -> checkpoint -> resume, plus the multichip
dryrun. Slow-ish (jit compiles) but the core integration coverage."""

import json
from pathlib import Path

import numpy as np
import pytest

from tpu2048.train.loop import TrainConfig, train


def _cfg(tmp_path, **kw):
    base = dict(
        steps=2, num_episodes=4, batch_size=32, ppo_epochs=1,
        points_weight=0.1, monotonicity_weight=1.0, emptiness_weight=0.5,
        upsample_ratio=0.25, scan_cap=192, print_frequency=1,
        warmup_steps=1, hidden_size=32, num_layers=1,
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        viz_dir=str(tmp_path / "viz"), eval_freq=None, seed=0,
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def run_result(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = _cfg(tmp, steps=3, eval_freq=2, eval_games=4)
    return tmp, cfg, train(cfg)


def test_training_runs_and_logs(run_result):
    tmp, cfg, out = run_result
    assert out["highest_score"] > 0
    assert out["env_steps_total"] > 100
    logs = list((tmp / "logs").glob("train_mlp_*.jsonl"))
    assert len(logs) == 1
    lines = [json.loads(l) for l in logs[0].read_text().splitlines()]
    train_lines = [l for l in lines if "avg_score" in l]
    assert len(train_lines) == 3
    # metric surface intact
    assert "kl_average" in train_lines[0] and "G_norm_std" in train_lines[0]
    eval_lines = [l for l in lines if "eval/avg_score" in l]
    assert len(eval_lines) == 1


def test_viz_and_checkpoints_written(run_result):
    tmp, cfg, out = run_result
    viz = sorted((tmp / "viz").glob("step_*.json"))
    assert len(viz) >= 3
    data = json.loads(viz[0].read_text())
    assert data["moves"] and "rewards" in data["moves"][0]
    assert set(data["moves"][0]["rewards"]) == {
        "points", "smoothness", "tile_bonus", "corner", "adjacency", "chain",
        "monotonicity", "topological", "emptiness",
    }
    ckpt = tmp / "ckpt"
    assert (ckpt / "train_state.npz").exists()
    assert (ckpt / "best_model.npz").exists()


def test_resume_continues(run_result, tmp_path):
    tmp, cfg, out = run_result
    from dataclasses import replace

    cfg2 = replace(cfg, steps=4, resume=True, viz_dir=None, eval_freq=None)
    out2 = train(cfg2)
    manifest = json.loads((tmp / "ckpt" / "train_state.json").read_text())
    assert manifest["train_step"] == 3  # resumed at 3, ran step 3 only


def test_evaluate_command(run_result):
    tmp, cfg, out = run_result
    from tpu2048.train.evaluate import evaluate_checkpoint

    m = evaluate_checkpoint(str(tmp / "ckpt"), games=4, seed=0)
    assert m["avg_score"] > 0 and len(m["scores"]) == 4


def test_export_demo_assets(run_result, tmp_path):
    tmp, cfg, out = run_result
    from tpu2048.train.evaluate import load_model_checkpoint
    from tpu2048.train.export import export_demo_assets

    params, mc, mt = load_model_checkpoint(str(tmp / "ckpt"))
    export_demo_assets(params, mc, mt, out["best_game_episode"], tmp_path / "demo")
    assert (tmp_path / "demo" / "model.onnx").stat().st_size > 1000
    assert (tmp_path / "demo" / "model_config.json").exists()
    game = json.loads((tmp_path / "demo" / "best_game.json").read_text())
    assert game["score"] == out["best_game_episode"]["total_points"]
    assert game["moves"][0]["action"] in ("UP", "DOWN", "LEFT", "RIGHT")
    # states exported as tile VALUES (2^k), not exponents
    flat = [v for row in game["moves"][-1]["state_after"] for v in row]
    assert max(flat) >= 16 and all(v == 0 or v % 2 == 0 for v in flat)


def test_urm_training_smoke(tmp_path):
    """URM trains (the reference disables this path, train.py:1528-1532)."""
    cfg = _cfg(tmp_path, steps=1, model_type="urm", hidden_size=16,
               num_layers=1, num_heads=2, num_loops=2, num_truncated_loops=1,
               scan_cap=128, viz_dir=None)
    out = train(cfg)
    assert out["highest_score"] > 0


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_search_eval_and_coefs(run_result):
    """--search eval path: coefs load from the train-state moments
    (sigma/mu denormalize the critic; reward weights + gamma from the
    config), and search eval runs end to end."""
    tmp, cfg, out = run_result
    from tpu2048.algo.search import SearchCoefs
    from tpu2048.train.evaluate import evaluate_checkpoint, load_search_coefs

    c = load_search_coefs(str(tmp / "ckpt"))
    assert c.points == cfg.points_weight  # moments present => real coefs
    assert c.mono == cfg.monotonicity_weight and c.gamma == cfg.gamma
    assert c.sigma > 0
    # Params-only directory falls back to pure normalized-EV search.
    import shutil

    only = tmp / "params_only"
    only.mkdir(exist_ok=True)
    for f in ("best_model.npz", "best_model.json"):
        shutil.copy(tmp / "ckpt" / f, only / f)
    assert load_search_coefs(str(only)) == SearchCoefs()

    m = evaluate_checkpoint(str(tmp / "ckpt"), games=4, search=True,
                            search_depth=2)
    assert m["avg_score"] > 0 and len(m["scores"]) == 4


def test_pipeline_equivalence(tmp_path):
    """Host/device pipelining must be invisible in every logged artifact:
    identical JSONL metric rows (minus timestamps), identical final params,
    identical checkpoints vs --no-pipeline."""
    import numpy as np

    def run(sub, pipeline):
        cfg = _cfg(tmp_path / sub, steps=4, eval_freq=2, eval_games=4,
                   checkpoint_freq=2, pipeline=pipeline, viz_dir=None)
        return cfg, train(cfg)

    cfg_a, out_a = run("pipe", True)
    cfg_b, out_b = run("sync", False)

    for a, b in zip(
        __import__("jax").tree.leaves(out_a["params"]),
        __import__("jax").tree.leaves(out_b["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert out_a["highest_score"] == out_b["highest_score"]
    assert out_a["env_steps_total"] == out_b["env_steps_total"]

    def rows(sub):
        f = sorted((tmp_path / sub / "logs").glob("train_mlp_*.jsonl"))[0]
        out = []
        for line in f.read_text().splitlines():
            r = json.loads(line)
            r.pop("timestamp", None)
            out.append(r)
        return out

    assert rows("pipe") == rows("sync")


def test_eval_streams_plural_by_default(tmp_path):
    """Eval-in-train env streams: by default the eval round index is folded
    into the env key (fresh reproducible spawns each eval, so best-checkpoint
    selection can't overfit one stream); --eval-fixed-stream restores the
    identical-stream reference-analog semantics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu2048.train.loop import TrainConfig, build_model, make_eval_fn

    cfg = _cfg(tmp_path, eval_freq=1, eval_games=8, scan_cap=64)
    _, init_fn, apply_eval, _, _ = build_model(cfg)
    params = init_fn(jax.random.key(0))
    k = jax.random.key(5)

    ev = make_eval_fn(cfg, apply_eval)
    r1 = np.asarray(ev(params, k, jnp.int32(1)))
    r2 = np.asarray(ev(params, k, jnp.int32(2)))
    r1b = np.asarray(ev(params, k, jnp.int32(1)))
    assert not np.array_equal(r1, r2)  # new stream per eval round
    np.testing.assert_array_equal(r1, r1b)  # but reproducible

    from dataclasses import replace

    fixed = make_eval_fn(replace(cfg, eval_fixed_stream=True), apply_eval)
    f1 = np.asarray(fixed(params, k, jnp.int32(1)))
    f2 = np.asarray(fixed(params, k, jnp.int32(2)))
    np.testing.assert_array_equal(f1, f2)  # index ignored: one fixed stream


def test_expert_iteration_trains(tmp_path):
    """--expert-iter: expectimax-expert rollout + imitation objective runs
    end to end; the policy moves toward the expert's actions (the weighted
    CE — policy_loss — falls across steps on the same data distribution)."""
    cfg = _cfg(tmp_path, steps=3, expert_iter=True, warmup_steps=0,
               learning_rate=0.01, critic_lr=0.01, upsample_ratio=0.25)
    out = train(cfg)
    assert out["highest_score"] > 0
    logs = list((tmp_path / "logs").glob("train_mlp_*.jsonl"))
    lines = [json.loads(l) for l in logs[0].read_text().splitlines()
             if "policy_loss" in l]
    assert len(lines) == 3
    # Imitation CE of a 4-way policy sits near log 4 for a near-uniform net
    # after 3 tiny steps (it can exceed log 4 when the policy underweights
    # the expert's choice; the learning direction itself is unit-tested
    # deterministically in tests/test_algo.py::test_imitation_loss_direction).
    assert 0.0 < lines[-1]["policy_loss"] < 2.5
    # Full metric surface intact in imitation mode too.
    assert "kl_average" in lines[0] and "G_norm_std" in lines[0]
    # The expert's trajectory is what's recorded: scores should be well above
    # a uniform-random policy's (~250-600 at these tiny step caps) even with
    # an untrained critic, because the expert's shaping term plays for
    # survival + monotone structure from step one.
    assert out["env_steps_total"] > 300


def test_expert_iteration_frozen_src(run_result, tmp_path):
    """--expert-iter --expert-src: the teacher (params + coefs) loads from a
    finished checkpoint dir and the run trains end to end — the stationary-
    teacher configuration that avoids the live-teacher feedback implosion
    (algo/rollout.py::rollout docstring)."""
    tmp, _, _ = run_result  # its ckpt dir has best_model + train_state
    cfg = _cfg(tmp_path, steps=2, expert_iter=True, warmup_steps=0,
               expert_src=str(tmp / "ckpt"), hidden_size=16,
               learning_rate=0.01, critic_lr=0.01, upsample_ratio=0.25)
    out = train(cfg)
    assert out["highest_score"] > 0
    logs = list((tmp_path / "logs").glob("train_mlp_*.jsonl"))
    lines = [json.loads(l) for l in logs[0].read_text().splitlines()
             if "policy_loss" in l]
    assert len(lines) == 2 and 0.0 < lines[-1]["policy_loss"] < 2.5
