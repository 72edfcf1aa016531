"""PPO-clip actor-critic loss + KL diagnostic (reference train.py:414-642).

Reproduced semantics, including the numerically quirky bits:

 * Policy logprobs come from logits masked to -inf at invalid actions
   (train.py:497-500); the log-ratio is clamped to ±20 pre-exp and the ratio
   clipped to [1-eps, 1+eps] with eps=0.2 (train.py:517-523).
 * The entropy bonus uses a SEPARATE distribution: the -inf-masked logits are
   clamped to [-20, 20] (so invalid actions re-enter at logit -20!) before a
   full 4-way log_softmax, then -sum p*logp over VALID entries only
   (train.py:531-541).
 * Value loss is smooth-L1 (Huber, delta=1) against the normalized RTG
   (train.py:543-546).
 * loss = -mean(ppo_clip - critic*value_loss + beta*entropy) (train.py:553-554).
 * After each optimizer step a second forward computes KL(old || new) over the
   valid-renormalized distributions as a diagnostic (train.py:577-601).

All means are weighted so padded samples in a fixed-shape minibatch contribute
nothing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf
PPO_EPS = 0.2
LOGIT_CLAMP = 20.0


def _wmean(x, w):
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


class LossStats(NamedTuple):
    loss: jnp.ndarray
    policy_loss: jnp.ndarray
    entropy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    entropy: jnp.ndarray


def smooth_l1(pred, target):
    """torch F.smooth_l1_loss (beta=1): 0.5 x^2 if |x|<1 else |x|-0.5."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def ppo_loss(logits, values, targets, action_mask, advantage, rtg,
             old_logprobs, weights, *, kl_strength, critic_strength,
             denom=None, target_probs=None):
    """Scalar loss + stats for one minibatch.

    logits (B,4), values (B,1), targets (B,), action_mask (B,4) True=invalid,
    advantage/rtg/weights (B,), old_logprobs (B,4).

    ``denom`` overrides the mean divisor (default: local sum of weights).
    Data-parallel callers pass the GLOBAL sample count so that psum(grads)
    equals the exact gradient of one big minibatch, and psum(stats) the exact
    global weighted means. ``target_probs`` is accepted for schema parity
    with ``imitation_loss`` and ignored.
    """
    del target_probs
    masked = jnp.where(action_mask, NEG_INF, logits)
    all_invalid = jnp.all(action_mask, axis=-1, keepdims=True)
    safe_masked = jnp.where(all_invalid, 0.0, masked)  # padding rows only
    new_policy_logprobs = jax.nn.log_softmax(safe_masked, axis=-1)

    tgt = targets[:, None]
    new_lp = jnp.take_along_axis(new_policy_logprobs, tgt, axis=-1)[:, 0]
    old_lp = jnp.take_along_axis(old_logprobs, tgt, axis=-1)[:, 0]

    log_ratio = jnp.clip(new_lp - old_lp, -LOGIT_CLAMP, LOGIT_CLAMP)
    ratio = jnp.exp(log_ratio)
    clipped = jnp.clip(ratio, 1.0 - PPO_EPS, 1.0 + PPO_EPS)
    ppo_clip = jnp.minimum(advantage * ratio, advantage * clipped)

    # Entropy from the clamped distribution (-inf -> -20 re-entry quirk).
    clamped = jnp.clip(masked, -LOGIT_CLAMP, LOGIT_CLAMP)
    lp2 = jax.nn.log_softmax(clamped, axis=-1)
    plogp = jnp.where(action_mask, 0.0, lp2 * jnp.exp(lp2))
    entropy = -jnp.sum(plogp, axis=-1)

    value_l = smooth_l1(values[:, 0], rtg)

    d = jnp.maximum(jnp.sum(weights), 1.0) if denom is None else denom
    wmean = lambda x: jnp.sum(x * weights) / d

    objective = ppo_clip - critic_strength * value_l + kl_strength * entropy
    loss = -wmean(objective)

    stats = LossStats(
        loss=loss,
        policy_loss=-wmean(jax.lax.stop_gradient(ppo_clip)),
        entropy_loss=-kl_strength * wmean(jax.lax.stop_gradient(entropy)),
        value_loss=critic_strength * wmean(jax.lax.stop_gradient(value_l)),
        entropy=wmean(jax.lax.stop_gradient(entropy)),
    )
    return loss, stats


def imitation_loss(logits, values, targets, action_mask, advantage, rtg,
                   old_logprobs, weights, *, kl_strength, critic_strength,
                   denom=None, target_probs=None, sharp=False):
    """Expert-iteration objective (net-new — no reference counterpart):
    cross-entropy of the masked policy against the expert's target
    distribution, plus the SAME entropy bonus and smooth-L1 value loss as
    ``ppo_loss`` (identical masking and clamping quirks, so the metric
    surface stays comparable).

        objective = gap * sum_a q(a) log pi(a|s) - critic*value_loss + beta*entropy

    ``target_probs`` q is the soft target recorded by the expert rollout
    (softmax of expectimax scores at a temperature); with ``None`` it falls
    back to a hard one-hot at ``targets``. The soft shape matters because
    2048 is full of near-tie states where the expert's argmax is a coin
    flip: measured CE(policy, hard expert labels) was ~6 nats at 55% argmax
    agreement, and training on unweighted hard labels collapsed the
    policy's solo play twice.

    ``sharp=True`` keeps q only for the DECISIVENESS gap (below) and takes
    the CE against one-hot(argmax q) instead of q itself. Measured on the
    depth-2 expert at tau=0.02: distilling the soft q verbatim drove solo
    SAMPLED play to ~1/7 of the warm-start score in 24 steps — the soft
    target's own entropy is high (the live sigma also grows under mixed
    expert/policy returns, flattening it further), so the faithful imitator
    becomes a high-entropy sampler. Sharp targets pull decisive states
    toward the expert's choice at full strength while the gap weight still
    zeroes the ties.

    ``advantage`` and ``old_logprobs`` are accepted (same minibatch schema as
    PPO — augmentation and the KL diagnostic reuse them) but do not enter the
    loss: the expert's actions are supervision, not samples to reweight.
    """
    del advantage
    masked = jnp.where(action_mask, NEG_INF, logits)
    all_invalid = jnp.all(action_mask, axis=-1, keepdims=True)
    safe_masked = jnp.where(all_invalid, 0.0, masked)  # padding rows only
    new_policy_logprobs = jax.nn.log_softmax(safe_masked, axis=-1)

    if target_probs is None:
        q = jax.nn.one_hot(targets, 4, dtype=jnp.float32)
    else:
        q = target_probs
    q_ce = (jax.nn.one_hot(jnp.argmax(q, axis=-1), 4, dtype=jnp.float32)
            if sharp else q)
    # q(_ce) is 0 on invalid actions whose logprob is -inf: mask before multiply.
    terms = jnp.where(q_ce > 0, q_ce * new_policy_logprobs, 0.0)
    new_lp = jnp.sum(terms, axis=-1)
    # Decisiveness weighting: scale each sample's CE by q's top1-top2 gap
    # (identity for one-hot targets). Most 2048 states are near-ties whose
    # soft target is near-uniform; unweighted CE is dominated by them, pulls
    # the policy toward the high-entropy MARGINAL choice distribution, and
    # measurably collapses solo play (the tie states outnumber and outgrade
    # the decisive ones, where the expert's preference actually matters).
    # Ties contribute ~0 gradient — the policy keeps its own priors there —
    # while decisive states get full-strength supervision.
    top2 = jax.lax.top_k(q, 2)[0]
    gap = jax.lax.stop_gradient(top2[:, 0] - top2[:, 1])
    new_lp = gap * new_lp

    clamped = jnp.clip(masked, -LOGIT_CLAMP, LOGIT_CLAMP)
    lp2 = jax.nn.log_softmax(clamped, axis=-1)
    plogp = jnp.where(action_mask, 0.0, lp2 * jnp.exp(lp2))
    entropy = -jnp.sum(plogp, axis=-1)

    value_l = smooth_l1(values[:, 0], rtg)

    d = jnp.maximum(jnp.sum(weights), 1.0) if denom is None else denom
    wmean = lambda x: jnp.sum(x * weights) / d

    objective = new_lp - critic_strength * value_l + kl_strength * entropy
    loss = -wmean(objective)

    stats = LossStats(
        loss=loss,
        policy_loss=-wmean(jax.lax.stop_gradient(new_lp)),
        entropy_loss=-kl_strength * wmean(jax.lax.stop_gradient(entropy)),
        value_loss=critic_strength * wmean(jax.lax.stop_gradient(value_l)),
        entropy=wmean(jax.lax.stop_gradient(entropy)),
    )
    return loss, stats


def kl_old_new(old_logits, new_logits, action_mask, weights, denom=None):
    """Diagnostic KL(old || new) over valid actions with renormalized masked
    log_softmax (train.py:594-601). Returns (kl_sum, kl_mean, kl_max) with
    padding excluded. ``denom`` overrides the mean divisor (DP callers pass
    the global count and psum kl_sum / pmax kl_max)."""
    all_invalid = jnp.all(action_mask, axis=-1, keepdims=True)

    def mls(z):
        z = jnp.where(action_mask, NEG_INF, z)
        return jax.nn.log_softmax(jnp.where(all_invalid, 0.0, z), axis=-1)

    lp_old, lp_new = mls(old_logits), mls(new_logits)
    terms = jnp.where(action_mask, 0.0, jnp.exp(lp_old) * (lp_old - lp_new))
    kl = jnp.sum(terms, axis=-1)
    kl = jnp.where(weights > 0, kl, 0.0)
    kl_sum = jnp.sum(kl)
    d = jnp.maximum(jnp.sum(weights), 1.0) if denom is None else denom
    kl_mean = kl_sum / d
    kl_max = jnp.max(kl)
    return kl_sum, kl_mean, kl_max
