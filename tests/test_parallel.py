"""Mesh helpers, tensor-parallel sharding, and SPMD train-step checks on the
virtual 8-device CPU mesh — including the sharded == single-chip parity test
(the SPMD step is the same code with axis collectives; D=1 must reproduce the
single-chip step exactly)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.algo import advantage as A
from tpu2048.algo import rollout as R
from tpu2048.algo import update as U
from tpu2048.ops import OptimizerConfig
from tpu2048.ops import optimizer as opt
from tpu2048.parallel import make_mesh, make_sharded_train_step
from tpu2048.parallel import tensor_parallel as TP
from tpu2048.models import MLPConfig, mlp
from tpu2048.train.loop import (SCALAR_KEYS, TrainConfig, build_model,
                                make_process_fn)


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


def _cfg(**kw):
    base = dict(
        steps=10, num_episodes=8, batch_size=16, scan_cap=64,
        hidden_size=32, num_layers=1, warmup_steps=2, dropout=0.0,
        points_weight=0.1, monotonicity_weight=1.0, emptiness_weight=0.5,
        critic_strength=0.2, upsample_ratio=0.25, rtg_beta=0.9, seed=0,
    )
    base.update(kw)
    return TrainConfig(**base)


def _setup(cfg):
    model_cfg, init_fn, apply_eval, apply_train, labels_fn = build_model(cfg)
    params = init_fn(jax.random.key(0))
    labels = labels_fn(params)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, critic_lr=1e-4)
    return params, labels, opt_cfg, apply_eval, apply_train


def _run_sharded(cfg, D, key, params, labels, opt_cfg, apply_eval, apply_train,
                 train_step=5):
    # train_step past the warmup: the cosine-with-warmup multiplier is 0 at
    # step 1, which would make every update a no-op and the checks vacuous.
    mesh = make_mesh(D)
    step = make_sharded_train_step(mesh, cfg, apply_eval, apply_train,
                                   labels, opt_cfg)
    return step(params, opt.init(params, labels), A.RtgMoments.initial(),
                key, jnp.int32(train_step), jnp.float32(0.02))


def test_sharded_d1_equals_single_chip():
    """The VERDICT parity requirement: the SPMD step on a 1-device mesh must
    reproduce the single-chip rollout_fn + process_fn pair numerically (same
    RNG stream: the shard body folds in axis_index=0 then splits)."""
    cfg = _cfg()
    params, labels, opt_cfg, apply_eval, apply_train = _setup(cfg)
    k_step = jax.random.key(42)

    p_sh, o_sh, m_sh, traj_sh, out_sh = _run_sharded(
        cfg, 1, k_step, params, labels, opt_cfg, apply_eval, apply_train
    )

    # single-chip path with the identical derived keys
    k_local = jax.random.fold_in(k_step, 0)
    k_roll, k_proc = jax.random.split(k_local)
    optimize_fn = U.make_optimize_fn(apply_train, labels, opt_cfg,
                                     cfg.batch_size, cfg.ppo_epochs,
                                     kl_diagnostic=cfg.kl_diagnostic)
    process_fn = make_process_fn(cfg, apply_train, labels, optimize_fn)
    traj = jax.jit(lambda p, k: R.rollout(apply_eval, p, k,
                                          cfg.num_episodes, cfg.rollout_cap))(
        params, k_roll)
    p_1, o_1, m_1, out_1 = process_fn(
        params, opt.init(params, labels), traj, A.RtgMoments.initial(),
        k_proc, jnp.int32(5), jnp.float32(0.02),
    )

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6, rtol=1e-6),
        p_sh, p_1,
    )
    np.testing.assert_allclose(np.asarray(m_sh.mu), np.asarray(m_1.mu),
                               rtol=1e-6)
    sc_sh = dict(zip(SCALAR_KEYS, np.asarray(out_sh["scalars"]).tolist()))
    sc_1 = dict(zip(SCALAR_KEYS, np.asarray(out_1["scalars"]).tolist()))
    for k in SCALAR_KEYS:
        np.testing.assert_allclose(sc_sh[k], sc_1[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
    np.testing.assert_array_equal(np.asarray(traj_sh.board_before),
                                  np.asarray(traj.board_before))


def test_critic_strength_reaches_sharded_objective():
    """Regression for the round-1 bug (hardcoded value-loss weight in the
    SPMD step): different --critic values must train different objectives."""
    params, labels, opt_cfg, apply_eval, apply_train = _setup(_cfg())
    key = jax.random.key(7)
    outs = []
    for cs in (0.2, 5.0):
        cfg = _cfg(critic_strength=cs)
        p2, *_ = _run_sharded(cfg, 2, key, params, labels, opt_cfg,
                              apply_eval, apply_train)
        outs.append(np.concatenate([np.asarray(l).ravel()
                                    for l in jax.tree.leaves(p2)]))
    assert not np.allclose(outs[0], outs[1])


def test_sharded_d4_global_stats_and_moments():
    """D=4: the RTG moment update must use GLOBAL batch statistics —
    recomputed on host from the returned global trajectory — and the packed
    scalar surface must be complete (augmentation live on every shard)."""
    cfg = _cfg(num_episodes=16, batch_size=32)
    params, labels, opt_cfg, apply_eval, apply_train = _setup(cfg)
    p2, o2, m2, traj, out = _run_sharded(cfg, 4, jax.random.key(3), params,
                                         labels, opt_cfg, apply_eval,
                                         apply_train)

    # host recomputation of the global batch moments from the global traj
    reward = A.step_rewards(traj.points, traj.mono_before, traj.mono_after,
                            traj.empt_before, traj.empt_after,
                            cfg.reward_weights, cfg.gamma)
    reward = jnp.where(traj.valid, reward, 0.0)
    G = np.asarray(A.returns_to_go(reward, traj.valid, cfg.gamma))
    w = np.asarray(traj.valid, dtype=np.float64)
    n = w.sum()
    mean = (G * w).sum() / n
    var = (np.square(G - mean) * w).sum() / n
    expected_mu = 0.9 * 0.0 + 0.1 * mean
    expected_m2 = 0.9 * 1.0 + 0.1 * (var + mean * mean)
    np.testing.assert_allclose(float(m2.mu), expected_mu, rtol=1e-4)
    np.testing.assert_allclose(float(m2.m2), expected_m2, rtol=1e-3)
    assert float(m2.first_moment) == float(m2.mu)

    sc = dict(zip(SCALAR_KEYS, np.asarray(out["scalars"]).tolist()))
    assert sc["env_steps"] == n
    assert sc["samples"] == n
    assert sc["augmented_samples"] > 0  # augmentation live in the SPMD path
    assert 0 <= sc["best_idx"] < cfg.num_episodes
    # best_idx is a GLOBAL index into the gathered episode axis
    scores = np.asarray(traj.total_points)
    assert scores[int(sc["best_idx"])] == scores.max()
    for leaf in jax.tree.leaves(p2):
        assert np.isfinite(np.asarray(leaf)).all()


def test_distributed_cli_trainer(tmp_path):
    """--mesh-data path: SPMD trainer end-to-end on the 8-device CPU mesh
    through the SAME train() loop — full metric surface, eval-in-train +
    best checkpoint, resume."""
    import json

    from tpu2048.train.loop import train

    cfg = TrainConfig(
        steps=3, num_episodes=16, batch_size=32, mesh_data=8,
        points_weight=0.1, monotonicity_weight=1.0, scan_cap=96,
        hidden_size=16, num_layers=1, warmup_steps=1, seed=0,
        upsample_ratio=0.25, eval_freq=2, eval_games=8,
        checkpoint_dir=str(tmp_path), log_dir=str(tmp_path / "logs"),
        print_frequency=1, adaptive_beta=True,
    )
    out = train(cfg)
    assert out["env_steps_total"] > 100
    assert (tmp_path / "train_state.npz").exists()
    assert (tmp_path / "best_model.npz").exists()  # eval-in-train saved best

    logs = list((tmp_path / "logs").glob("train_mlp_*.jsonl"))
    assert logs
    rows = [json.loads(l) for l in logs[0].read_text().splitlines()]
    step_rows = [r for r in rows if "avg_score" in r]
    # the full single-chip metric surface, not the round-1 reduced set
    for k in ("kl_average", "explained_var", "advantage_l2", "current_beta",
              "ema_avg_score", "peak_score", "augmented_samples"):
        assert k in step_rows[0], k
    assert any("eval/avg_score" in r for r in rows)

    # resume continues from the checkpoint
    from dataclasses import replace

    train(replace(cfg, steps=4, resume=True, eval_freq=None))
    manifest = json.loads((tmp_path / "train_state.json").read_text())
    assert manifest["train_step"] == 3


def test_sharded_expert_iteration_runs():
    """expert_iter under the SPMD step: depth-1 expectimax rollout with
    live-moment coefs + imitation objective runs on a 2-device mesh and
    produces finite params/moments and the full scalar vector."""
    cfg = _cfg(expert_iter=True, expert_depth=1, num_episodes=4,
               batch_size=8, scan_cap=48)
    params, labels, opt_cfg, apply_eval, apply_train = _setup(cfg)
    p, o, m, traj, out = _run_sharded(
        cfg, 2, jax.random.key(7), params, labels, opt_cfg, apply_eval,
        apply_train)
    assert np.isfinite(np.asarray(out["scalars"])).all()
    jax.tree.map(lambda a: np.testing.assert_(np.isfinite(np.asarray(a)).all()), p)
    assert float(np.asarray(traj.total_points).max()) > 0


def test_sharded_expert_src_uses_frozen_teacher(tmp_path):
    """--expert-src under the SPMD step (round-2 ADVICE medium finding): the
    frozen teacher's params + denormalization coefs must be threaded into the
    sharded rollout, not silently dropped in favor of the live learner. The
    D=1 sharded trajectory must match a direct single-chip frozen-teacher
    rollout bit-for-bit on the same derived key."""
    from tpu2048.train.loop import train
    from tpu2048.train.evaluate import load_model_checkpoint, load_search_coefs

    # A real (tiny) checkpoint dir with best_model + train_state.
    src = _cfg(num_episodes=4, batch_size=16, scan_cap=48, steps=1,
               warmup_steps=0, checkpoint_dir=str(tmp_path / "ckpt"),
               log_dir=str(tmp_path / "logs"))
    train(src)

    cfg = _cfg(expert_iter=True, expert_depth=1, num_episodes=4,
               batch_size=8, scan_cap=48, expert_src=str(tmp_path / "ckpt"))
    params, labels, opt_cfg, apply_eval, apply_train = _setup(cfg)
    k_step = jax.random.key(11)
    p, o, m, traj, out = _run_sharded(
        cfg, 1, k_step, params, labels, opt_cfg, apply_eval, apply_train)
    assert np.isfinite(np.asarray(out["scalars"])).all()

    # Reproduce the sharded body's rollout with the frozen teacher threaded
    # the way the single-chip loop does it (train/loop.py frozen-src branch).
    e_params, e_mc, e_mt = load_model_checkpoint(cfg.expert_src)
    e_coefs = load_search_coefs(cfg.expert_src)
    e_apply = lambda pp, x: mlp.apply(pp, e_mc, x)
    k_roll, _ = jax.random.split(jax.random.fold_in(k_step, 0))
    ref = R.rollout(apply_eval, params, k_roll, cfg.num_episodes,
                    cfg.rollout_cap, expert_depth=cfg.expert_depth,
                    expert_coefs=e_coefs, expert_mix=cfg.expert_mix,
                    expert_tau=cfg.expert_tau, expert_apply=e_apply,
                    expert_params=e_params)
    np.testing.assert_array_equal(np.asarray(traj.target_action),
                                  np.asarray(ref.target_action))
    np.testing.assert_allclose(np.asarray(traj.target_probs),
                               np.asarray(ref.target_probs), atol=1e-6)

    # And the frozen teacher actually changes behavior vs the live-learner
    # fallback (the exact silent divergence the ADVICE finding describes).
    live = R.rollout(apply_eval, params, k_roll, cfg.num_episodes,
                     cfg.rollout_cap, expert_depth=cfg.expert_depth,
                     expert_coefs=e_coefs, expert_mix=cfg.expert_mix,
                     expert_tau=cfg.expert_tau)
    assert not np.allclose(np.asarray(traj.target_probs),
                           np.asarray(live.target_probs))


def test_sharded_packed_d4_global_stats_and_carry_continuity():
    """Packed-mode mirror of test_sharded_d4_global_stats_and_moments
    (VERDICT r4 item 6): at D=4 the packed SPMD step must (a) produce the
    full scalar surface with exactly lanes*horizon env steps, (b) update the
    RTG moments from GLOBAL cross-shard statistics — checked against a host
    recomputation over the gathered global trajectory — and (c) thread the
    EnvCarry across steps so lanes continue mid-episode (board and
    episode-accumulator continuity)."""
    from tpu2048.parallel.train_step import init_sharded_env_carry

    cfg = _cfg(packed=True, lanes=16, horizon=32, batch_size=64)
    params, labels, opt_cfg, apply_eval, apply_train = _setup(cfg)
    mesh = make_mesh(4)
    step = make_sharded_train_step(mesh, cfg, apply_eval, apply_train,
                                   labels, opt_cfg)
    carry0 = init_sharded_env_carry(mesh, jax.random.key(11), cfg.lanes)
    m0 = A.RtgMoments.initial()
    o0 = opt.init(params, labels)

    p1, o1, m1, carry1, traj1, out1 = step(
        params, o0, m0, carry0, jax.random.key(5), jnp.int32(5),
        jnp.float32(0.02))

    # (a) scalar surface + exact occupancy accounting
    sc = dict(zip(SCALAR_KEYS, np.asarray(out1["scalars"]).tolist()))
    assert sc["env_steps"] == cfg.lanes * cfg.horizon
    assert sc["samples"] == cfg.lanes * cfg.horizon
    assert sc["augmented_samples"] > 0

    # (b) global moments: recompute on host from the gathered global traj
    w = cfg.reward_weights
    out_host = A.compute_packed(
        traj1.points, traj1.mono_before, traj1.mono_after,
        traj1.empt_before, traj1.empt_after, traj1.value_pred,
        traj1.valid, traj1.done_here, traj1.boot_value,
        w, cfg.gamma, m0, cfg.rtg_beta, 5)
    np.testing.assert_allclose(float(m1.mu),
                               float(out_host["new_moments"].mu), rtol=1e-4)
    np.testing.assert_allclose(float(m1.m2),
                               float(out_host["new_moments"].m2), rtol=1e-3)

    # (c) carry continuity: the next chunk starts exactly where this one
    # ended — first board_before of step 2 == carry-out boards of step 1.
    p2, o2, m2, carry2, traj2, out2 = step(
        p1, o1, m1, carry1, jax.random.key(6), jnp.int32(6),
        jnp.float32(0.02))
    np.testing.assert_array_equal(np.asarray(traj2.board_before[0]),
                                  np.asarray(carry1.boards).astype(np.int8))
    # episode accumulators continue: lanes not done at the boundary carry
    # their running move counts into the next chunk's completions.
    done_last = np.asarray(traj1.done_here[-1])
    epm = np.asarray(carry1.ep_moves)
    assert (epm[done_last] == 0).all()
    assert (epm >= 0).all() and epm.max() > 0

    for leaf in jax.tree.leaves(p2):
        assert np.isfinite(np.asarray(leaf)).all()
