"""Mesh helpers, tensor-parallel sharding, and SPMD train-step checks on the
virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.parallel import make_mesh
from tpu2048.parallel import tensor_parallel as TP
from tpu2048.models import MLPConfig, mlp


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_axis=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(6, model_axis=4)


def test_tensor_parallel_forward_matches_single_device():
    cfg = MLPConfig(hidden_dim=64, num_layers=2, dropout=0.0)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    x = jax.random.normal(jax.random.key(1), (16, 48))
    ref_logits, ref_value = mlp.apply(params, cfg, x)

    mesh = make_mesh(8, model_axis=8)  # pure TP mesh
    sharded = TP.shard_mlp(params, mesh)
    fwd = TP.tp_forward(lambda p, inp: mlp.apply(p, cfg, inp), mesh)
    logits, value = fwd(sharded, x)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_value),
                               atol=1e-5, rtol=1e-5)
    # weights actually sharded across devices
    w = sharded["blocks"][0]["lin"]["w"]
    assert len(w.sharding.device_set) == 8


def test_sharded_train_step_matches_moments_math():
    """The SPMD step's RTG moment update must follow the reference formula
    with GLOBAL batch statistics."""
    from tpu2048.algo.advantage import RewardWeights, RtgMoments
    from tpu2048.ops import OptimizerConfig
    from tpu2048.ops import optimizer as opt
    from tpu2048.parallel import make_sharded_train_step

    mesh = make_mesh(4)
    cfg = MLPConfig(hidden_dim=32, num_layers=1, dropout=0.0)
    params = mlp.init(jax.random.key(0), cfg)
    labels = mlp.param_labels(params)
    step = make_sharded_train_step(
        mesh, lambda p, x: mlp.apply(p, cfg, x),
        lambda p, x, r: mlp.apply(p, cfg, x, train=True, rng=r),
        labels, OptimizerConfig(), num_envs=8, max_steps=48, batch_size=8,
        epochs=1, weights=RewardWeights(points=0.1, monotonicity=1.0),
        gamma=0.99, rtg_beta=0.9, warmup_steps=2, total_steps=10,
    )
    p2, s2, m2, metrics = step(params, opt.init(params, labels),
                               RtgMoments.initial(), jax.random.key(3),
                               jnp.int32(1), jnp.float32(0.02))
    bm = float(metrics["batch_mean"])
    bv = float(metrics["batch_var"])
    # new_mu = 0.9*0 + 0.1*bm ; new_m2 = 0.9*1 + 0.1*(bv + bm^2)
    assert abs(float(m2.mu) - 0.1 * bm) < 1e-4
    assert abs(float(m2.m2) - (0.9 + 0.1 * (bv + bm * bm))) < max(1e-3, 1e-5 * abs(bv))
    assert float(m2.first_moment) == float(m2.mu)
    assert int(metrics["env_steps"]) > 0
    # params moved and are finite
    for leaf in jax.tree.leaves(p2):
        assert np.isfinite(np.asarray(leaf)).all()


def test_distributed_cli_trainer(tmp_path):
    """--mesh-data path: SPMD trainer end-to-end on the 8-device CPU mesh,
    with checkpoint + resume through the same train() entry point."""
    from tpu2048.train.loop import TrainConfig, train

    cfg = TrainConfig(
        steps=2, num_episodes=16, batch_size=32, mesh_data=8,
        points_weight=0.1, monotonicity_weight=1.0, scan_cap=96,
        hidden_size=16, num_layers=1, warmup_steps=1, seed=0,
        checkpoint_dir=str(tmp_path), log_dir=str(tmp_path / "logs"),
        print_frequency=1,
    )
    out = train(cfg)
    assert out["env_steps_total"] > 100
    assert (tmp_path / "train_state.npz").exists()

    import json

    logs = list((tmp_path / "logs").glob("train_mlp_dp_*.jsonl"))
    assert logs
    rows = [json.loads(l) for l in logs[0].read_text().splitlines()]
    assert len(rows) == 2 and rows[0]["avg_score"] > 0

    # resume continues from the checkpoint
    from dataclasses import replace

    out2 = train(replace(cfg, steps=3, resume=True))
    manifest = json.loads((tmp_path / "train_state.json").read_text())
    assert manifest["train_step"] == 2
