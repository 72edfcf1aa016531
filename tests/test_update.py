"""Minibatch-update program + checkpoint roundtrip + stats assembly."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu2048.algo import update as U
from tpu2048.models import MLPConfig, mlp
from tpu2048.ops import OptimizerConfig
from tpu2048.ops import optimizer as opt
from tests.conftest import random_board_np


def _make_dataset(rng, S_cap, S_valid):
    boards = np.stack([random_board_np(rng) for _ in range(S_cap)])
    mask = np.zeros((S_cap, 4), bool)
    mask[:, 3] = True  # one invalid action everywhere
    lp = np.log(np.full((S_cap, 4), 1 / 3))
    lp[:, 3] = -np.inf
    valid = np.arange(S_cap) < S_valid
    tp = np.full((S_cap, 4), 1 / 3)
    tp[:, 3] = 0.0  # imitation target: uniform over the valid actions
    return U.Dataset(
        board_before=jnp.asarray(boards, jnp.int8),
        action=jnp.asarray(rng.integers(0, 3, S_cap), jnp.int32),
        action_mask=jnp.asarray(mask),
        advantage=jnp.asarray(rng.normal(size=S_cap), jnp.float32),
        G_norm=jnp.asarray(rng.normal(size=S_cap), jnp.float32),
        logprobs=jnp.asarray(lp, jnp.float32),
        target_probs=jnp.asarray(tp, jnp.float32),
        valid=jnp.asarray(valid),
    )


def test_optimize_runs_and_counts_minibatches(rng):
    cfg = MLPConfig(hidden_dim=32, num_layers=1, dropout=0.1)
    params = mlp.init(jax.random.key(0), cfg)
    labels = mlp.param_labels(params)
    ocfg = OptimizerConfig(learning_rate=1e-3, critic_lr=1e-3)
    state = opt.init(params, labels)
    apply_train = lambda p, x, r: mlp.apply(p, cfg, x, train=True, rng=r)

    optimize = U.make_optimize_fn(apply_train, labels, ocfg, batch_size=16,
                                  epochs=2)
    jopt = jax.jit(optimize)

    ds = _make_dataset(rng, S_cap=128, S_valid=50)
    new_params, new_state, stats = jopt(
        params, state, ds, jax.random.key(1), jnp.float32(0.1),
        jnp.float32(0.2), jnp.float32(1.0),
    )
    # ceil(50/16)=4 minibatches x 2 epochs = 8 optimizer steps
    assert int(stats.num_batches) == 8
    assert int(new_state.adamw.step) == 8
    assert np.isfinite(float(stats.loss))
    assert float(stats.entropy) > 0
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, new_params)
    assert max(jax.tree.leaves(diff)) > 0

    # dynamic S: same compiled fn, different valid count -> different counts
    ds2 = _make_dataset(rng, S_cap=128, S_valid=128)
    _, st2, stats2 = jopt(params, state, ds2, jax.random.key(2),
                          jnp.float32(0.1), jnp.float32(0.2), jnp.float32(1.0))
    assert int(stats2.num_batches) == 16  # ceil(128/16)*2


def test_optimize_zero_schedule_freezes_params(rng):
    cfg = MLPConfig(hidden_dim=32, num_layers=1, dropout=0.0)
    params = mlp.init(jax.random.key(0), cfg)
    labels = mlp.param_labels(params)
    ocfg = OptimizerConfig()
    optimize = U.make_optimize_fn(
        lambda p, x, r: mlp.apply(p, cfg, x, train=True, rng=r),
        labels, ocfg, batch_size=8, epochs=1,
    )
    ds = _make_dataset(rng, 32, 20)
    new_params, _, _ = jax.jit(optimize)(
        params, opt.init(params, labels), ds, jax.random.key(1),
        jnp.float32(0.1), jnp.float32(0.2), jnp.float32(0.0),  # lr mult 0
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_anchor_kl_trust_region(rng):
    """The anchor KL term must (a) keep the updated policy measurably closer
    to the frozen anchor than an unanchored run on the same data, and (b)
    vanish at strength 0 (bitwise-identical to no anchor)."""
    cfg = MLPConfig(hidden_dim=32, num_layers=1, dropout=0.0)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    labels = mlp.param_labels(params)
    ocfg = OptimizerConfig(learning_rate=5e-2, critic_lr=5e-2)
    apply_train = lambda p, x, r: mlp.apply(p, cfg, x, train=True, rng=r)
    apply_eval = lambda p, x: mlp.apply(p, cfg, x)
    anchor_params = jax.tree.map(jnp.asarray, params)

    # Imitation targets that conflict with the (near-uniform) anchor: always
    # push toward action 0, so unanchored CE drives the policy far away.
    ds = _make_dataset(rng, S_cap=64, S_valid=64)
    tp = np.zeros((64, 4), np.float32)
    tp[:, 0] = 1.0
    ds = ds._replace(target_probs=jnp.asarray(tp),
                     action=jnp.zeros((64,), jnp.int32))

    def run(anchor):
        optimize = U.make_optimize_fn(apply_train, labels, ocfg, batch_size=16,
                                      epochs=4, objective="imitation",
                                      anchor=anchor, kl_diagnostic=False)
        p, s = params, opt.init(params, labels)
        for i in range(4):
            p, s, _ = jax.jit(optimize)(
                p, s, ds, jax.random.key(i), jnp.float32(0.0),
                jnp.float32(0.2), jnp.float32(1.0))
        return p

    def kl_to_anchor(p):
        from tpu2048.algo import losses
        from tpu2048.models.encoding import encode_boards

        x = encode_boards(ds.board_before.astype(jnp.int32))
        a_logits, _ = apply_eval(anchor_params, x)
        n_logits, _ = apply_eval(p, x)
        w = jnp.ones((64,), jnp.float32)
        _, kl_mean, _ = losses.kl_old_new(a_logits, n_logits, ds.action_mask, w)
        return float(kl_mean)

    p_free = run(None)
    p_anchored = run((apply_eval, anchor_params, 10.0))
    kl_free, kl_anch = kl_to_anchor(p_free), kl_to_anchor(p_anchored)
    assert kl_free > 0.05  # the CE genuinely moves the free policy
    assert kl_anch < 0.5 * kl_free

    # strength path disabled == anchor None, bit for bit
    p_zero = run((apply_eval, anchor_params, 0.0))
    for a, b in zip(jax.tree.leaves(p_free), jax.tree.leaves(p_zero)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(tmp_path):
    from tpu2048.train import checkpoint as CKPT
    from tpu2048.algo.advantage import RtgMoments

    cfg = MLPConfig(hidden_dim=32, num_layers=1)
    params = mlp.init(jax.random.key(3), cfg, zero_heads=False)
    labels = mlp.param_labels(params)
    state = opt.init(params, labels)
    moments = RtgMoments(jnp.float32(1.5), jnp.float32(2.5), jnp.float32(1.5))
    tree = dict(params=params, opt_state=state, moments=moments)
    CKPT.save_checkpoint(tmp_path, "train_state", arrays_tree=tree,
                         manifest={"train_step": 7})

    template = dict(
        params=mlp.init(jax.random.key(9), cfg),
        opt_state=opt.init(params, labels),
        moments=RtgMoments.initial(),
    )
    loaded, manifest = CKPT.load_checkpoint(tmp_path, "train_state", template)
    assert manifest["train_step"] == 7
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_assemble_metrics_key_surface():
    """Metric names must match the reference's compute_batch_stats keys
    (train.py:992-1040) exactly, quirks included."""
    from tpu2048.utils import stats as S

    dstats = {k: jnp.float32(1.0) for k in [
        "samples", "augmented_samples", "reward_mean", "reward_var",
        "zero_reward_pct", "advantage_mean", "advantage_var", "advantage_l2",
        "adv_min", "adv_max", "G_norm_mean", "G_norm_std", "G_norm_min",
        "G_norm_max", "G_raw_std", "V_std", "A_std", "var_reduction",
        "explained_var", "avg_score", "median_score", "avg_episode_return",
    ]}
    ostats = {k: 0.5 for k in [
        "policy_loss", "entropy_loss", "value_loss", "grad_norm", "entropy",
        "kl_total", "kl_average", "kl_max",
    ]}
    m = S.assemble_metrics(
        dstats, ostats, highest_score=10, ema_avg_score=1.0, ema_pct_512=0,
        ema_pct_1024=0, ema_pct_2048=0, batch_pct_512=0, batch_pct_1024=0,
        batch_pct_2048=0, ema_explained_var=0, current_beta=0.1, lr=1e-3,
    )
    expected = [
        "samples", "augmented_samples", "actor_loss", "critic_loss",
        "total_loss", "policy_loss", "entropy_loss", "value_loss",
        "actor_grad_norm", "critic_grad_norm", "grad_norm", "entropy",
        "peak_score", "avg_score", "ema_avg_score", "median_score",
        "avg_episode_return", "pct_512", "ema_pct_512", "pct_1024",
        "ema_pct_1024", "pct_2048", "ema_pct_2048", "reward_var",
        "reward_mean", "zero_reward_pct", "advantage_mean", "advantage_var",
        "advantage_l2", "adv_min", "adv_max", "G_norm_mean", "G_norm_std",
        "G_norm_min", "G_norm_max", "G_raw_std", "V_std", "A_std",
        "var_reduction", "explained_var", "ema_explained_var", "kl_total",
        "kl_average", "kl_max", "actor_lr", "critic_lr", "current_beta",
    ]
    assert list(m.keys()) == expected
    assert m["total_loss"] == 0 and m["actor_loss"] == 0  # reference quirk


def test_profiling_timer():
    from tpu2048.utils.profiling import Timer
    import jax.numpy as jnp

    f = jax.jit(lambda: jnp.ones((8, 8)).sum())
    t = Timer(lambda: f(), warmup=1, repeats=3)
    assert t.best_seconds > 0 and t.mean_seconds >= t.best_seconds
