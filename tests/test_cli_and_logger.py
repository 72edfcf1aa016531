"""CLI argument parsing (flag-name parity with the reference) and
MetricLogger behavior."""

import json

import pytest


def test_train_flag_surface_parses():
    from tpu2048.train.cli import _add_train_flags
    import argparse

    p = argparse.ArgumentParser()
    _add_train_flags(p)
    # The reference README invocation, verbatim flag names (README.md:12).
    args = p.parse_args(
        "--steps 20000 --episodes 4 --batch-size 4 --lr 1e-3 --critic-lr 1e-4 "
        "-H 196 --gamma 0.99 --entropy 0.02 --points 0.10 --mono 1.0 "
        "--critic 0.2 --rtg-beta 0.99 --eval-freq 100 --warmup-steps 10 "
        "--upsample-ratio 0.25 --model-type mlp".split()
    )
    assert args.steps == 20000
    assert args.num_episodes == 4
    assert args.learning_rate == 1e-3
    assert args.critic_lr == 1e-4
    assert args.hidden_size == 196
    assert args.entropy_strength == 0.02
    assert args.points_weight == 0.10
    assert args.monotonicity_weight == 1.0
    assert args.critic_strength == 0.2
    assert args.rtg_beta == 0.99
    assert args.upsample_ratio == 0.25

    # Every reference flag exists (train.py:1285-1455).
    for flags in [
        "--epsilon --momentum --workers --max-steps --num-layers --num-heads "
        "--num-loops --truncated-loops --print-freq --show-last-steps "
        "--smoothness --tile-bonus --corner --adjacency --chain --emptiness "
        "--topo --win-bonus --gpu --viz-dir --log-dir --wandb-project "
        "--wandb-run --eval-games --decouple-critic --export-demo "
        "--checkpoint-dir --beta1 --beta2 --weight-decay --adaptive-beta "
        "--target-entropy --beta-min --beta-max --beta-lr"
    ]:
        pass
    args2 = p.parse_args(
        "--epsilon 1.0 --momentum 0.99 --workers 2 --num-layers 3 "
        "--tile-bonus 0.5 --corner 0.1 --adjacency 0.2 --chain 0.3 "
        "--smoothness 0.4 --emptiness 0.6 --topo 0.7 --win-bonus 1000 "
        "--adaptive-beta --target-entropy 0.7 --beta-min 0.001 --beta-max 1.0 "
        "--beta-lr 0.01 --decouple-critic --weight-decay 0.01 "
        "--beta1 0.9 --beta2 0.999 --wandb-project x --eval-games 10".split()
    )
    assert args2.adaptive_beta and args2.decouple_critic
    assert args2.win_bonus == 1000


def test_train_config_from_args():
    from tpu2048.train.cli import _add_train_flags
    from tpu2048.train.loop import TrainConfig
    import argparse

    p = argparse.ArgumentParser()
    _add_train_flags(p)
    args = p.parse_args("--steps 5 --episodes 2".split())
    fields = set(TrainConfig.__dataclass_fields__)
    kwargs = {k: v for k, v in vars(args).items() if k in fields}
    cfg = TrainConfig(**kwargs)
    assert cfg.steps == 5 and cfg.num_episodes == 2


def test_metric_logger(tmp_path, capsys):
    from tpu2048.utils import MetricLogger

    with MetricLogger(log_dir=str(tmp_path), experiment_name="train_test") as lg:
        lg.log({"loss": 0.5, "score": 1234, "tiny": 0.0001}, step=7)
        lg.log({"quiet": 1}, step=8, verbose=False)
        lg.print("hello")
    out = capsys.readouterr().out
    assert "--- Step 7 ---" in out
    assert "loss: 0.50" in out
    assert "1.00e-04" in out  # small floats -> scientific
    assert "quiet" not in out  # verbose=False skips stdout
    assert "hello" in out

    files = list(tmp_path.glob("train_test_*_001.jsonl"))
    assert len(files) == 1
    lines = [json.loads(l) for l in files[0].read_text().splitlines()]
    assert lines[0]["step"] == 7 and lines[0]["loss"] == 0.5
    assert lines[1]["quiet"] == 1  # file gets everything
    # unique-suffix behavior
    lg2 = MetricLogger(log_dir=str(tmp_path), experiment_name="train_test")
    assert "002" in lg2.log_file.name
    lg2.close()


def test_wandb_path_with_stub(tmp_path, monkeypatch):
    """The wandb fan-out (never exercisable in this image — no egress) against
    a stub module: init/log/finish call pattern mirrors the reference's
    (/root/reference/logger.py:70-85, 141-145, 153-160)."""
    import sys
    import types

    from tpu2048.utils import MetricLogger

    calls = {"init": [], "log": [], "finish": 0}
    stub = types.ModuleType("wandb")

    def _init(**kw):
        calls["init"].append(kw)
        return types.SimpleNamespace(id="stub-run")

    stub.init = _init
    stub.log = lambda metrics, step=None: calls["log"].append((metrics, step))

    def _finish():
        calls["finish"] += 1

    stub.finish = _finish
    monkeypatch.setitem(sys.modules, "wandb", stub)

    cfg = {"steps": 3, "learning_rate": 1e-3}
    with MetricLogger(log_dir=str(tmp_path), experiment_name="train_wb",
                      use_wandb=True, wandb_project="proj2048",
                      wandb_run_name="run-x", wandb_config=cfg) as lg:
        assert lg.use_wandb and lg.wandb_run is not None
        lg.log({"loss": 0.25}, step=1)
        lg.log({"loss": 0.125, "score": 42}, step=2, verbose=False)

    assert calls["init"] == [dict(project="proj2048", name="run-x",
                                  config=cfg, reinit=True)]
    assert calls["log"] == [({"loss": 0.25}, 1),
                            ({"loss": 0.125, "score": 42}, 2)]
    assert calls["finish"] == 1  # close() finishes the run exactly once


def test_wandb_missing_module_disables_cleanly(tmp_path, monkeypatch):
    """ImportError path: use_wandb silently downgrades with a warning
    (reference logger.py:81-85) instead of crashing the trainer."""
    import builtins
    import sys

    from tpu2048.utils import MetricLogger

    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    real_import = builtins.__import__

    def deny_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError("no wandb in image")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", deny_wandb)
    lg = MetricLogger(log_dir=str(tmp_path), experiment_name="train_wb2",
                      use_wandb=True)
    assert lg.use_wandb is False and lg.wandb_run is None
    lg.log({"x": 1}, step=0)  # must not touch wandb
    lg.close()
