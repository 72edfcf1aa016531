"""Algorithm-layer tests: advantage math golden tests (reference
train.py:651-904 formulas), PPO loss vs a torch transcription of the
reference's loss (train.py:491-601), symmetry-augmentation invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from tpu2048.algo import advantage as A
from tpu2048.algo import losses
from tpu2048.env import oracle, symmetry
from tests.conftest import random_board_np


# --- advantage ---------------------------------------------------------------


def _ref_advantage(episodes, gamma, weights, rtg_beta, rtg_mu, rtg_m2, rtg_step):
    """Straight Python transcription of the reference math (train.py:694-772,
    892-901) over a list of episodes: each a list of dicts with points,
    mono_b/mono_a/empt_b/empt_a, value."""
    eps = 1e-8
    for ep in episodes:
        for m in ep:
            m["reward"] = (
                weights.points * m["points"]
                + weights.monotonicity * (gamma * m["mono_a"] - m["mono_b"])
                + weights.emptiness * (gamma * m["empt_a"] - m["empt_b"])
            )
    for ep in episodes:
        G = 0.0
        for m in reversed(ep):
            G = m["reward"] + gamma * G
            m["G_raw"] = G
    flat = [m for ep in episodes for m in ep]
    N = len(flat)
    mean = sum(m["G_raw"] for m in flat) / N
    var = sum((m["G_raw"] - mean) ** 2 for m in flat) / N
    bc = max(1 - rtg_beta ** max(rtg_step, 1), eps)
    mu_c, m2_c = rtg_mu / bc, rtg_m2 / bc
    std = max(m2_c - mu_c**2, eps) ** 0.5
    for m in flat:
        m["G_norm"] = (m["G_raw"] - mu_c) / (std + eps)
        m["advantage"] = m["G_norm"] - m["value"]
    new_mu = rtg_beta * rtg_mu + (1 - rtg_beta) * mean
    new_m2 = rtg_beta * rtg_m2 + (1 - rtg_beta) * (var + mean**2)
    return episodes, new_mu, new_m2


def test_advantage_matches_reference_math(rng):
    T, N = 7, 3
    lens = [7, 4, 6]
    points = rng.integers(0, 30, (T, N)).astype(np.int32)
    mono_b = rng.integers(0, 20, (T, N)).astype(np.int32)
    mono_a = rng.integers(0, 20, (T, N)).astype(np.int32)
    empt_b = rng.integers(0, 16, (T, N)).astype(np.int32)
    empt_a = rng.integers(0, 16, (T, N)).astype(np.int32)
    value = rng.normal(size=(T, N)).astype(np.float32)
    valid = np.zeros((T, N), bool)
    for i, L in enumerate(lens):
        valid[:L, i] = True
        points[L:, i] = 0
        mono_b[L:, i] = mono_a[L:, i] = 0
        empt_b[L:, i] = empt_a[L:, i] = 0

    weights = A.RewardWeights(points=0.1, monotonicity=1.0, emptiness=0.5)
    gamma, rtg_beta, rtg_step = 0.99, 0.9, 3
    mu0, m20 = 0.37, 1.21

    out = jax.jit(
        lambda: A.compute(
            jnp.asarray(points), jnp.asarray(mono_b), jnp.asarray(mono_a),
            jnp.asarray(empt_b), jnp.asarray(empt_a), jnp.asarray(value),
            jnp.asarray(valid), weights, gamma,
            A.RtgMoments(jnp.float32(mu0), jnp.float32(m20), jnp.float32(mu0)),
            rtg_beta, rtg_step,
        )
    )()

    episodes = [
        [
            dict(points=int(points[t, i]), mono_b=float(mono_b[t, i]),
                 mono_a=float(mono_a[t, i]), empt_b=float(empt_b[t, i]),
                 empt_a=float(empt_a[t, i]), value=float(value[t, i]))
            for t in range(lens[i])
        ]
        for i in range(N)
    ]
    ref_eps, new_mu, new_m2 = _ref_advantage(
        episodes, gamma, weights, rtg_beta, mu0, m20, rtg_step
    )

    for i in range(N):
        for t in range(lens[i]):
            m = ref_eps[i][t]
            assert abs(float(out["reward"][t, i]) - m["reward"]) < 1e-4
            assert abs(float(out["G_raw"][t, i]) - m["G_raw"]) < 1e-3
            assert abs(float(out["G_norm"][t, i]) - m["G_norm"]) < 1e-4
            assert abs(float(out["advantage"][t, i]) - m["advantage"]) < 1e-4
    assert abs(float(out["new_moments"].mu) - new_mu) < 1e-5
    assert abs(float(out["new_moments"].m2) - new_m2) < 1e-3
    assert float(out["new_moments"].first_moment) == float(out["new_moments"].mu)


def test_rtg_initial_moments_quirk():
    """Step-1 normalization uses mu=0, m2=1 bias-corrected by (1-beta):
    std = sqrt(1/(1-0.9)) = sqrt(10) (reference train.py:744-754 with the
    initial values from train.py:1550-1552)."""
    G = jnp.ones((4, 1)) * 2.0
    valid = jnp.ones((4, 1), bool)
    G_norm, _, _, _ = A.normalize_rtg(G, valid, A.RtgMoments.initial(), 0.9, 1)
    expect = 2.0 / (np.sqrt(10.0) + 1e-8)
    np.testing.assert_allclose(np.asarray(G_norm), expect, rtol=1e-5)


# --- PPO loss vs torch transcription ----------------------------------------


def _torch_reference_loss(logits, values, targets, mask, advantage, rtg,
                          old_logprobs, beta, critic):
    """Literal transcription of the reference's loss math (train.py:497-554)."""
    logits = torch.tensor(logits, requires_grad=False)
    masked = logits.masked_fill(torch.tensor(mask), float("-inf"))
    new_policy_logprobs = masked.log_softmax(dim=-1)
    t = torch.tensor(targets)[:, None]
    new_lp = new_policy_logprobs.gather(-1, t)
    old_lp = torch.tensor(old_logprobs).gather(-1, t)
    ratio = (new_lp - old_lp).squeeze(1).clamp(-20, 20).exp()
    clipped = ratio.clamp(0.8, 1.2)
    adv = torch.tensor(advantage)
    ppo_clip = torch.minimum(adv * ratio, adv * clipped)
    clamped = masked.clamp(-20, 20)
    lp2 = clamped.log_softmax(dim=-1)
    ent_terms = lp2 * lp2.exp()
    ent = -torch.where(torch.tensor(mask), torch.zeros(()), ent_terms).sum(-1)
    vl = F.smooth_l1_loss(torch.tensor(values)[:, 0], torch.tensor(rtg),
                          reduction="none")
    loss = -(ppo_clip - critic * vl + beta * ent).mean()
    return (loss.item(), ppo_clip.detach().numpy(), ent.numpy(), vl.numpy())


def test_ppo_loss_matches_reference(rng):
    B = 16
    logits = rng.normal(size=(B, 4)).astype(np.float32)
    values = rng.normal(size=(B, 1)).astype(np.float32)
    mask = rng.random((B, 4)) < 0.3
    mask[:, 0] = False  # keep at least one valid action
    targets = np.zeros(B, np.int32)
    adv = rng.normal(size=B).astype(np.float32)
    rtg = rng.normal(size=B).astype(np.float32)
    old_masked = np.where(mask, -np.inf, rng.normal(size=(B, 4))).astype(np.float32)
    old_lp = old_masked - np.log(np.exp(old_masked).sum(-1, keepdims=True))
    beta, critic = 0.1, 0.2

    loss, stats = jax.jit(
        lambda: losses.ppo_loss(
            jnp.asarray(logits), jnp.asarray(values), jnp.asarray(targets),
            jnp.asarray(mask), jnp.asarray(adv), jnp.asarray(rtg),
            jnp.asarray(old_lp), jnp.ones(B),
            kl_strength=beta, critic_strength=critic,
        )
    )()
    t_loss, t_ppo, t_ent, t_vl = _torch_reference_loss(
        logits, values, targets, mask, adv, rtg, old_lp, beta, critic
    )
    assert abs(float(loss) - t_loss) < 1e-5
    assert abs(float(stats.entropy) - t_ent.mean()) < 1e-5
    assert abs(float(stats.value_loss) - critic * t_vl.mean()) < 1e-5
    assert abs(float(stats.policy_loss) - (-t_ppo.mean())) < 1e-5


def test_kl_diagnostic_matches_reference(rng):
    B = 8
    old_logits = rng.normal(size=(B, 4)).astype(np.float32)
    new_logits = rng.normal(size=(B, 4)).astype(np.float32)
    mask = rng.random((B, 4)) < 0.3
    mask[:, 2] = False

    kl_sum, kl_mean, kl_max = jax.jit(
        lambda: losses.kl_old_new(
            jnp.asarray(old_logits), jnp.asarray(new_logits), jnp.asarray(mask),
            jnp.ones(B),
        )
    )()

    # torch.masked-style renormalized log_softmax over valid entries
    o = torch.tensor(old_logits).masked_fill(torch.tensor(mask), float("-inf"))
    n = torch.tensor(new_logits).masked_fill(torch.tensor(mask), float("-inf"))
    lo, ln = o.log_softmax(-1), n.log_softmax(-1)
    terms = torch.where(torch.tensor(mask), torch.zeros(()), lo.exp() * (lo - ln))
    kl = terms.sum(-1)
    assert abs(float(kl_sum) - kl.sum().item()) < 1e-5
    assert abs(float(kl_mean) - kl.mean().item()) < 1e-5
    assert abs(float(kl_max) - kl.max().item()) < 1e-5


# --- symmetry augmentation ---------------------------------------------------


TRANSFORM_ORACLE = {
    symmetry.MIRROR_H: lambda g: oracle.mirror(g, "horizontal"),
    symmetry.MIRROR_V: lambda g: oracle.mirror(g, "vertical"),
    symmetry.ROT90: lambda g: oracle.rotate_cw(g),
    symmetry.ROT180: lambda g: oracle.rotate_cw(oracle.rotate_cw(g)),
    symmetry.ROT270: lambda g: oracle.rotate_cw(oracle.rotate_cw(oracle.rotate_cw(g))),
}


def test_transform_board_matches_oracle(rng):
    boards = np.stack([random_board_np(rng) for _ in range(10)])
    for tf, fn in TRANSFORM_ORACLE.items():
        out = np.asarray(
            jax.jit(symmetry.transform_board)(
                jnp.asarray(boards), jnp.full((10,), tf, jnp.int32)
            )
        )
        for i in range(10):
            grid = [list(map(int, r)) for r in boards[i]]
            assert out[i].tolist() == fn(grid), tf


def test_action_remap_consistency(rng):
    """Transformed (board, action) pairs stay dynamically consistent: moving
    the transformed board by the remapped action equals transforming the moved
    board. This is the invariant the reference's remap tables encode
    (train.py:784-824)."""
    for tf, fn in TRANSFORM_ORACLE.items():
        for _ in range(20):
            grid = [list(map(int, r)) for r in random_board_np(rng)]
            for action in oracle.legal_directions(grid):
                moved, score, _ = oracle.simulate_move(grid, action)
                new_action = int(symmetry.ACTION_MAP[tf, action])
                t_grid = fn(grid)
                t_moved, t_score, _ = oracle.simulate_move(t_grid, new_action)
                assert t_moved == fn(moved), (tf, action)
                assert t_score == score


def test_action_vector_remap_roundtrip(rng):
    vec = rng.normal(size=(6, 4)).astype(np.float32)
    tf = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    out = np.asarray(symmetry.transform_action_vector(jnp.asarray(vec), tf))
    for i in range(6):
        expect = np.zeros(4, np.float32)
        for old in range(4):
            expect[symmetry.ACTION_MAP[i, old]] = vec[i, old]
        np.testing.assert_allclose(out[i], expect)


def test_augment_produces_consistent_samples(rng):
    from tpu2048.algo import augment as AUG

    S = 64
    boards = np.stack([random_board_np(rng) for _ in range(S)])
    valid = np.ones(S, bool)
    # pick legal actions per board
    actions = np.zeros(S, np.int64)
    masks = np.zeros((S, 4), bool)
    for i in range(S):
        grid = [list(map(int, r)) for r in boards[i]]
        legal = oracle.legal_directions(grid)
        if not legal:
            valid[i] = False
            masks[i] = True
            continue
        actions[i] = legal[0]
        masks[i] = [d not in legal for d in range(4)]

    out = jax.jit(
        lambda k: AUG.augment(
            k, 16, jnp.int32(16), jnp.asarray(valid),
            jnp.asarray(boards, jnp.int8), jnp.asarray(boards, jnp.int8),
            jnp.asarray(actions, jnp.int32), jnp.asarray(masks),
            jnp.zeros((S, 4), jnp.float32),
            jax.nn.one_hot(jnp.asarray(actions), 4, dtype=jnp.float32),
            jnp.ones(S), jnp.ones(S),
            jnp.ones(S, jnp.int32),
        )
    )(jax.random.key(0))

    b = np.asarray(out.board_before, int)
    a = np.asarray(out.action)
    m = np.asarray(out.action_mask)
    v = np.asarray(out.valid)
    assert v.sum() > 0
    tp = np.asarray(out.target_probs)
    for i in np.nonzero(v)[0]:
        grid = [list(map(int, r)) for r in b[i]]
        # remapped action must be legal on the transformed board, and the
        # permuted mask must agree with the transformed board's legality
        assert not m[i, a[i]]
        assert m[i].tolist() == [not oracle.direction_is_legal(grid, d) for d in range(4)]
        # the one-hot target permutes with the action
        assert tp[i].argmax() == a[i] and tp[i].sum() == 1.0


def test_imitation_loss_direction(rng):
    """losses.imitation_loss (expert iteration): the CE term equals the
    masked NLL at the expert action (cross-checked vs torch), and one
    gradient step on the logits raises the expert action's probability."""
    B = 16
    logits = jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(B, 1)), jnp.float32)
    mask = jnp.zeros((B, 4), jnp.bool_).at[:, 3].set(True)  # action 3 invalid
    targets = jnp.asarray(rng.integers(0, 3, (B,)), jnp.int32)
    rtg = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    old_lp = jnp.zeros((B, 4), jnp.float32)
    w = jnp.ones((B,), jnp.float32)

    def f(z):
        loss, _ = losses.imitation_loss(
            z, values, targets, mask, jnp.zeros((B,)), rtg, old_lp, w,
            kl_strength=0.0, critic_strength=0.0)
        return loss

    loss, g = jax.value_and_grad(f)(logits)
    # Torch cross-check: CE of the -inf-masked log_softmax at the target.
    t = torch.tensor(np.asarray(logits))
    t[:, 3] = float("-inf")
    want = F.cross_entropy(t, torch.tensor(np.asarray(targets), dtype=torch.long))
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
    # Gradient direction: stepping against the gradient raises P(expert a).
    stepped = logits - 1.0 * g
    p0 = jax.nn.softmax(jnp.where(mask, -jnp.inf, logits), axis=-1)
    p1 = jax.nn.softmax(jnp.where(mask, -jnp.inf, stepped), axis=-1)
    sel = lambda p: np.asarray(jnp.take_along_axis(p, targets[:, None], axis=-1))
    assert (sel(p1) > sel(p0)).all()

    # Soft targets: CE against a distribution q equals -sum q log pi, and a
    # one-hot q reproduces the hard-label loss exactly.
    q_hard = jax.nn.one_hot(targets, 4, dtype=jnp.float32)
    loss_hard, _ = losses.imitation_loss(
        logits, values, targets, mask, jnp.zeros((B,)), rtg, old_lp, w,
        kl_strength=0.0, critic_strength=0.0, target_probs=q_hard)
    np.testing.assert_allclose(float(loss_hard), float(loss), rtol=1e-6)
    q_soft = jnp.asarray(np.abs(rng.normal(size=(B, 4))).astype(np.float32))
    q_soft = jnp.where(mask, 0.0, q_soft)
    q_soft = q_soft / q_soft.sum(-1, keepdims=True)
    loss_soft, _ = losses.imitation_loss(
        logits, values, targets, mask, jnp.zeros((B,)), rtg, old_lp, w,
        kl_strength=0.0, critic_strength=0.0, target_probs=q_soft)
    lp_masked = jax.nn.log_softmax(jnp.where(mask, -jnp.inf, logits), axis=-1)
    ce_rows = jnp.sum(jnp.where(mask, 0.0, q_soft * lp_masked), axis=-1)
    srt = jnp.sort(q_soft, axis=-1)
    gap = srt[:, -1] - srt[:, -2]  # decisiveness weighting (losses.py)
    want_soft = -float(jnp.mean(gap * ce_rows))
    np.testing.assert_allclose(float(loss_soft), want_soft, rtol=1e-5)


def test_expert_rollout_records_expert_actions(rng):
    """rollout(expert_depth=1): every recorded target_action reproduces the
    expectimax argmax on its pre-move board; expert-driven envs TAKE it,
    policy-driven envs (expert_mix < 1, DAgger) sample the policy."""
    from tpu2048.algo import rollout as R
    from tpu2048.algo import search as SRCH
    from tpu2048.models import MLPConfig, mlp

    cfg = MLPConfig(hidden_dim=16, num_layers=1)
    params = mlp.init(jax.random.key(2), cfg, zero_heads=False)
    apply_fn = lambda p, x: mlp.apply(p, cfg, x)
    coefs = SRCH.SearchCoefs(points=0.1, mono=1.0, sigma=3.0, mu=1.0,
                             gamma=0.99)
    N = 8
    traj = R.rollout(apply_fn, params, jax.random.key(0), N, 64,
                     expert_depth=1, expert_coefs=coefs, expert_mix=0.5,
                     expert_tau=0.05)
    valid = np.asarray(traj.valid)
    boards = np.asarray(traj.board_before, np.int32)
    actions = np.asarray(traj.action)
    targets = np.asarray(traj.target_action)
    # Expert-driven envs (first half) take the target.
    assert (actions[:, : N // 2][valid[:, : N // 2]]
            == targets[:, : N // 2][valid[:, : N // 2]]).all()
    # Policy-driven envs deviate from the expert at least sometimes.
    pol_v = valid[:, N // 2:]
    assert (actions[:, N // 2:][pol_v] != targets[:, N // 2:][pol_v]).any()
    # Soft targets: valid rows sum to 1, argmax matches target_action, and
    # illegal actions carry zero mass.
    tp = np.asarray(traj.target_probs)
    inv = np.asarray(traj.action_mask)
    np.testing.assert_allclose(tp[valid].sum(-1), 1.0, rtol=1e-5)
    assert (tp[valid].argmax(-1) == targets[valid]).all()
    assert (tp[valid][inv[valid]] == 0.0).all()
    checked = 0
    for t in range(boards.shape[0]):
        for n in range(boards.shape[1]):
            if not valid[t, n] or checked >= 40:
                continue
            s = SRCH.expectimax_scores(
                apply_fn, params, jnp.asarray(boards[t, n])[None],
                coefs=coefs, depth=1)
            assert int(np.argmax(np.asarray(s)[0])) == int(targets[t, n])
            checked += 1
    assert checked >= 20


def test_frozen_expert_rollout(rng):
    """rollout(expert_apply/expert_params): threading a frozen teacher equal
    to the live policy reproduces the live-teacher trajectory exactly; a
    DIFFERENT teacher's labels come from the teacher net, not the student —
    its target_actions match expectimax on the teacher's params."""
    from tpu2048.algo import rollout as R
    from tpu2048.algo import search as SRCH
    from tpu2048.models import MLPConfig, mlp

    cfg = MLPConfig(hidden_dim=16, num_layers=1)
    student = mlp.init(jax.random.key(2), cfg, zero_heads=False)
    teacher = mlp.init(jax.random.key(7), cfg, zero_heads=False)
    apply_fn = lambda p, x: mlp.apply(p, cfg, x)
    coefs = SRCH.SearchCoefs(points=0.1, mono=1.0, sigma=3.0, mu=1.0,
                             gamma=0.99)
    kw = dict(expert_depth=1, expert_coefs=coefs, expert_mix=0.5,
              expert_tau=0.05)
    live = R.rollout(apply_fn, student, jax.random.key(0), 8, 48, **kw)
    same = R.rollout(apply_fn, student, jax.random.key(0), 8, 48,
                     expert_apply=apply_fn, expert_params=student, **kw)
    np.testing.assert_array_equal(np.asarray(live.target_action),
                                  np.asarray(same.target_action))
    np.testing.assert_array_equal(np.asarray(live.board_after),
                                  np.asarray(same.board_after))

    froz = R.rollout(apply_fn, student, jax.random.key(0), 8, 48,
                     expert_apply=apply_fn, expert_params=teacher, **kw)
    valid = np.asarray(froz.valid)
    boards = np.asarray(froz.board_before, np.int32)
    targets = np.asarray(froz.target_action)
    checked, differs = 0, 0
    for t in range(boards.shape[0]):
        for n in range(boards.shape[1]):
            if not valid[t, n] or checked >= 30:
                continue
            b = jnp.asarray(boards[t, n])[None]
            s_t = SRCH.expectimax_scores(apply_fn, teacher, b,
                                         coefs=coefs, depth=1)
            assert int(np.argmax(np.asarray(s_t)[0])) == int(targets[t, n])
            s_s = SRCH.expectimax_scores(apply_fn, student, b,
                                         coefs=coefs, depth=1)
            differs += int(np.argmax(np.asarray(s_s)[0]) != targets[t, n])
            checked += 1
    assert checked >= 20
    assert differs > 0  # the teacher is actually the one labeling


def test_imitation_gap_weighting(rng):
    """Soft-target CE is scaled by the target's top1-top2 gap: a uniform
    (pure-tie) target contributes zero policy gradient; a one-hot target is
    unchanged (gap = 1)."""
    B = 8
    logits = jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
    values = jnp.zeros((B, 1), jnp.float32)
    mask = jnp.zeros((B, 4), jnp.bool_)
    targets = jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32)
    rtg = jnp.zeros((B,), jnp.float32)
    old_lp = jnp.zeros((B, 4), jnp.float32)
    w = jnp.ones((B,), jnp.float32)

    def grad_for(q):
        f = lambda z: losses.imitation_loss(
            z, values, targets, mask, jnp.zeros((B,)), rtg, old_lp, w,
            kl_strength=0.0, critic_strength=0.0, target_probs=q)[0]
        return jax.grad(f)(logits)

    uniform = jnp.full((B, 4), 0.25, jnp.float32)
    np.testing.assert_allclose(np.asarray(grad_for(uniform)), 0.0, atol=1e-7)
    onehot = jax.nn.one_hot(targets, 4, dtype=jnp.float32)
    g_soft_path = grad_for(onehot)
    f_hard = lambda z: losses.imitation_loss(
        z, values, targets, mask, jnp.zeros((B,)), rtg, old_lp, w,
        kl_strength=0.0, critic_strength=0.0)[0]
    np.testing.assert_allclose(np.asarray(g_soft_path),
                               np.asarray(jax.grad(f_hard)(logits)),
                               rtol=1e-5, atol=1e-7)


def test_imitation_sharp_targets(rng):
    """sharp=True: the CE pulls toward one-hot(argmax q) while the
    decisiveness weight still comes from the SOFT q — equal to the soft CE
    for one-hot targets, and for a soft q equal to gap * NLL(argmax q)."""
    B = 8
    logits = jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
    values = jnp.zeros((B, 1), jnp.float32)
    mask = jnp.zeros((B, 4), jnp.bool_)
    targets = jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32)
    rtg = jnp.zeros((B,), jnp.float32)
    old_lp = jnp.zeros((B, 4), jnp.float32)
    w = jnp.ones((B,), jnp.float32)

    def loss_for(q, sharp):
        return losses.imitation_loss(
            logits, values, targets, mask, jnp.zeros((B,)), rtg, old_lp, w,
            kl_strength=0.0, critic_strength=0.0, target_probs=q,
            sharp=sharp)[0]

    # Soft q with a known argmax and gap.
    q = jnp.asarray(np.abs(rng.normal(size=(B, 4))).astype(np.float32)) + 0.1
    q = q / q.sum(-1, keepdims=True)
    lp = jax.nn.log_softmax(logits, axis=-1)
    top2 = np.sort(np.asarray(q), axis=-1)
    gap = top2[:, -1] - top2[:, -2]
    nll_argmax = -np.take_along_axis(
        np.asarray(lp), np.asarray(q.argmax(-1))[:, None], axis=-1)[:, 0]
    want = float(np.mean(gap * nll_argmax))
    np.testing.assert_allclose(float(loss_for(q, True)), want, rtol=1e-5)

    # One-hot q: sharp and soft agree exactly.
    onehot = jax.nn.one_hot(targets, 4, dtype=jnp.float32)
    np.testing.assert_allclose(float(loss_for(onehot, True)),
                               float(loss_for(onehot, False)), rtol=1e-6)

    # A pure-tie q still contributes zero gradient in sharp mode.
    uniform = jnp.full((B, 4), 0.25, jnp.float32)
    g = jax.grad(lambda z: losses.imitation_loss(
        z, values, targets, mask, jnp.zeros((B,)), rtg, old_lp, w,
        kl_strength=0.0, critic_strength=0.0, target_probs=uniform,
        sharp=True)[0])(logits)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_associative_rtg_matches_sequential_scan():
    """returns_to_go is evaluated as a parallel suffix scan on TPU (round 5,
    log-depth instead of T sequential kernels); it must agree with the
    literal backward lax.scan to fp32 roundoff on long mixed-validity
    trajectories."""
    import jax

    rng = np.random.default_rng(0)
    T, N = 384, 64
    rewards = jnp.asarray(rng.normal(scale=3.0, size=(T, N)), jnp.float32)
    valid = jnp.asarray(rng.random((T, N)) < 0.9)
    for gamma in (0.9, 0.99, 1.0):
        a = np.asarray(A.returns_to_go(rewards, valid, gamma))
        b = np.asarray(A.returns_to_go_sequential(rewards, valid, gamma))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-4)


def test_associative_rtg_packed_matches_sequential_scan():
    import jax

    rng = np.random.default_rng(1)
    T, N = 384, 64
    rewards = jnp.asarray(rng.normal(scale=3.0, size=(T, N)), jnp.float32)
    done = jnp.asarray(rng.random((T, N)) < 0.02)
    boot = jnp.asarray(rng.normal(scale=5.0, size=(N,)), jnp.float32)
    for gamma in (0.9, 0.995):
        a = np.asarray(A.returns_to_go_packed(rewards, done, gamma, boot))
        b = np.asarray(A.returns_to_go_packed_sequential(
            rewards, done, gamma, boot))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-4)
        # segment semantics: a done step's G is exactly its own reward + 0
        d = np.asarray(done)
        np.testing.assert_allclose(a[d], np.asarray(rewards)[d], rtol=1e-6)
