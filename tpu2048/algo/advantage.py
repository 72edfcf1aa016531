"""Reward assembly, return-to-go, streaming normalization, advantage.

Array re-implementation of the reference's calculate_advantage
(train.py:651-904) over (T, N) trajectory tensors, reproducing its exact
quirks:

 * Only raw points + two PBRS potentials (monotonicity, emptiness) enter the
   live reward (train.py:698-719); the other seven documented weights are
   accepted but inert — they are logged, never applied.
 * Normalization uses bias-corrected EMA moments with ``max(1-beta^step, eps)``
   (train.py:744-754) — and the moments are updated from batch statistics only
   AFTER the batch was normalized with the old moments (train.py:892-901).
 * Advantage = normalized RTG - predicted value (value head lives in the
   normalized space; no GAE) (train.py:762-772).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8


@dataclass(frozen=True)
class RewardWeights:
    """All nine documented weights + win bonus (reference train.py:651-669).
    Only ``points``, ``monotonicity`` and ``emptiness`` affect the reward."""

    points: float = 0.0
    smoothness: float = 0.0
    max_tile: float = 0.0
    corner: float = 0.0
    adjacency: float = 0.0
    chain: float = 0.0
    monotonicity: float = 0.0
    emptiness: float = 0.0
    topological: float = 0.0
    win_bonus: float = 0.0


class RtgMoments(NamedTuple):
    """Streaming RTG moment state (train.py:1550-1552 initial values)."""

    mu: jnp.ndarray  # EMA of E[G]
    m2: jnp.ndarray  # EMA of E[G^2]
    first_moment: jnp.ndarray  # kept aliased to mu (train.py:898-901)

    @staticmethod
    def initial() -> "RtgMoments":
        return RtgMoments(jnp.zeros(()), jnp.ones(()), jnp.zeros(()))


def step_rewards(points, mono_before, mono_after, empt_before, empt_after,
                 weights: RewardWeights, gamma: float) -> jnp.ndarray:
    """reward = points_w*points + PBRS(monotonicity) + PBRS(emptiness)
    (train.py:698-719). PBRS terms: w * (gamma*phi_after - phi_before)."""
    r = weights.points * points.astype(jnp.float32)
    r = r + weights.monotonicity * (gamma * mono_after.astype(jnp.float32)
                                    - mono_before.astype(jnp.float32))
    r = r + weights.emptiness * (gamma * empt_after.astype(jnp.float32)
                                 - empt_before.astype(jnp.float32))
    return r


def _affine_suffix_scan(a: jnp.ndarray, b: jnp.ndarray) -> tuple:
    """Parallel suffix composition of per-step affine maps f_t(G) = a_t*G +
    b_t along axis 0: returns (A, B) with (A_t, B_t) = f_t o f_{t+1} o ...
    o f_{T-1}, so G_t = A_t * G_T + B_t.

    The discounted return is a first-order linear recurrence; lax.scan runs
    it as T sequential tiny kernels (the per-iteration launch latency class
    that dominates small-batch TPU steps), while associative_scan runs
    ~2*log2(T) passes of large elementwise ops — the XLA-native shape for
    this hardware. Composition order inside the tree differs from the
    sequential evaluation, so results agree to fp32 roundoff, not bitwise
    (tests pin the tolerance against the sequential reference)."""
    def comb(lhs, rhs):
        # reverse=True flips, scans, flips back: lhs is the LATER step in
        # time, rhs the earlier — so the earlier map applies after:
        # (f_rhs o f_lhs)(x) = ra*(la*x + lb) + rb.
        (la, lb), (ra, rb) = lhs, rhs
        return la * ra, rb + ra * lb

    return jax.lax.associative_scan(comb, (a, b), reverse=True, axis=0)


def returns_to_go(rewards: jnp.ndarray, valid: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Discounted backward accumulation per env: G_t = r_t + gamma*G_{t+1}
    (train.py:721-728), evaluated as a parallel suffix scan (see
    _affine_suffix_scan). rewards/valid: (T, N); steps past the episode end
    have reward 0 so the tail contributes nothing."""
    r = jnp.where(valid, rewards, 0.0)
    _, G = _affine_suffix_scan(jnp.full_like(r, gamma), r)
    return G


def returns_to_go_sequential(rewards: jnp.ndarray, valid: jnp.ndarray,
                             gamma: float) -> jnp.ndarray:
    """The literal backward lax.scan form of :func:`returns_to_go` — kept as
    the semantic reference the parallel version is tested against."""
    r = jnp.where(valid, rewards, 0.0)

    def back(G, r_t):
        G = r_t + gamma * G
        return G, G

    _, G = jax.lax.scan(back, jnp.zeros(r.shape[1:]), r, reverse=True)
    return G


def corrected_mu_std(moments: RtgMoments, rtg_beta: float, rtg_step) -> tuple:
    """Bias-corrected (mu, std) from the streaming moments — the scale the
    critic's normalized predictions live in (train.py:744-754)."""
    bias_correction = jnp.maximum(1.0 - rtg_beta ** jnp.maximum(rtg_step, 1), EPS)
    mu_c = moments.mu / bias_correction
    m2_c = moments.m2 / bias_correction
    var = jnp.maximum(m2_c - jnp.square(mu_c), EPS)
    return mu_c, jnp.sqrt(var)


def returns_to_go_packed(rewards: jnp.ndarray, done_here: jnp.ndarray,
                         gamma: float, bootstrap: jnp.ndarray) -> jnp.ndarray:
    """Segment-aware discounted backward scan for PACKED (auto-reset) lanes:
    G_t = r_t + gamma * (0 if the episode ended at t else G_{t+1}).

    ``bootstrap`` (N,) seeds the scan with the RAW-return-scale value estimate
    of the state AFTER the last recorded step — the cut tail of an episode
    spanning the chunk boundary is valued by the critic instead of dropped.
    Lanes whose last step was terminal never read it (done zeroes the carry).

    Evaluated as a parallel suffix scan over the per-step affine maps
    G_t = a_t*G_{t+1} + r_t with a_t = gamma*(1 - done_t) — the episode cut
    at a done step zeroes the downstream composition exactly, so segment
    boundaries need no special casing (see _affine_suffix_scan).
    """
    a = jnp.where(done_here, 0.0, gamma)
    A, B = _affine_suffix_scan(a, rewards.astype(jnp.float32))
    return A * bootstrap + B


def returns_to_go_packed_sequential(rewards: jnp.ndarray,
                                    done_here: jnp.ndarray, gamma: float,
                                    bootstrap: jnp.ndarray) -> jnp.ndarray:
    """The literal backward lax.scan form of :func:`returns_to_go_packed` —
    kept as the semantic reference the parallel version is tested against."""
    def back(G, x):
        r, d = x
        G = r + gamma * jnp.where(d, 0.0, G)
        return G, G

    _, G = jax.lax.scan(back, bootstrap, (rewards, done_here), reverse=True)
    return G


def normalize_rtg(G: jnp.ndarray, valid: jnp.ndarray, moments: RtgMoments,
                  rtg_beta: float, rtg_step, axis_name=None) -> tuple:
    """Normalize with bias-corrected OLD moments, then fold the batch stats
    into the moments (the reference's deliberate ordering, train.py:744-760 +
    892-901). ``rtg_step`` is the 1-indexed train step.

    With ``axis_name`` (running per-shard under shard_map) the batch moments
    are GLOBAL — psum'd over the data axis — so every device folds identical
    statistics into the replicated moment state.

    Returns (G_norm (T,N), new_moments, batch_mean, batch_var).
    """
    ar = (lambda x: jax.lax.psum(x, axis_name)) if axis_name else (lambda x: x)
    w = valid.astype(jnp.float32)
    n = jnp.maximum(ar(jnp.sum(w)), 1.0)
    batch_mean = ar(jnp.sum(G * w)) / n
    batch_var = ar(jnp.sum(jnp.square(G - batch_mean) * w)) / n

    mu_c, std = corrected_mu_std(moments, rtg_beta, rtg_step)
    G_norm = (G - mu_c) / (std + EPS)

    new_mu = rtg_beta * moments.mu + (1.0 - rtg_beta) * batch_mean
    new_m2 = rtg_beta * moments.m2 + (1.0 - rtg_beta) * (batch_var + jnp.square(batch_mean))
    new_moments = RtgMoments(new_mu, new_m2, new_mu)
    return G_norm, new_moments, batch_mean, batch_var


def compute(traj_points, mono_b, mono_a, empt_b, empt_a, value_pred, valid,
            weights: RewardWeights, gamma: float, moments: RtgMoments,
            rtg_beta: float, rtg_step, axis_name=None) -> dict:
    """Full advantage pipeline over (T, N) arrays. Returns a dict with
    reward, G_raw, G_norm, advantage (all (T, N)) and new_moments.
    ``axis_name``: psum the batch moments over a data-parallel mesh axis."""
    reward = step_rewards(traj_points, mono_b, mono_a, empt_b, empt_a, weights, gamma)
    reward = jnp.where(valid, reward, 0.0)
    G_raw = returns_to_go(reward, valid, gamma)
    G_norm, new_moments, batch_mean, batch_var = normalize_rtg(
        G_raw, valid, moments, rtg_beta, rtg_step, axis_name=axis_name
    )
    advantage = G_norm - value_pred
    return dict(
        reward=reward,
        G_raw=G_raw,
        G_norm=G_norm,
        advantage=advantage,
        new_moments=new_moments,
        batch_mean=batch_mean,
        batch_var=batch_var,
    )


def compute_packed(traj_points, mono_b, mono_a, empt_b, empt_a, value_pred,
                   valid, done_here, boot_value, weights: RewardWeights,
                   gamma: float, moments: RtgMoments, rtg_beta: float,
                   rtg_step, axis_name=None) -> dict:
    """Advantage pipeline for PACKED (auto-reset) trajectories: the backward
    scan resets at episode boundaries (``done_here``), and the episode cut at
    the chunk end is bootstrapped with the critic's value, denormalized into
    raw-return units with the bias-corrected OLD moments — the same moments
    that then normalize the batch, so bootstrap and normalization are
    mutually consistent. Everything else (reward assembly, moment-update
    ordering, advantage) is identical to :func:`compute`."""
    reward = step_rewards(traj_points, mono_b, mono_a, empt_b, empt_a,
                          weights, gamma)
    reward = jnp.where(valid, reward, 0.0)
    mu_c, std = corrected_mu_std(moments, rtg_beta, rtg_step)
    boot_raw = mu_c + (std + EPS) * boot_value  # invert (G - mu)/(std + eps)
    G_raw = returns_to_go_packed(reward, done_here, gamma, boot_raw)
    G_norm, new_moments, batch_mean, batch_var = normalize_rtg(
        G_raw, valid, moments, rtg_beta, rtg_step, axis_name=axis_name
    )
    advantage = G_norm - value_pred
    return dict(
        reward=reward,
        G_raw=G_raw,
        G_norm=G_norm,
        advantage=advantage,
        new_moments=new_moments,
        batch_mean=batch_mean,
        batch_var=batch_var,
    )
