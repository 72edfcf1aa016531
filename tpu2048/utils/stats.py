"""Batch statistics (reference compute_batch_stats, train.py:922-1041).

Split in two: ``device_stats`` does the array reductions inside the train-step
jit; ``assemble_metrics`` (host) merges them with optimizer stats and EMA
trackers into the exact metric-name surface of the reference — including its
quirks, reproduced deliberately for curve parity:

 * ``avg_score``/``median_score`` include the augmented pseudo-episode's
   total_points (train.py:964-970 iterates rollout_episodes unfiltered),
   while per-step stats exclude augmented moves (train.py:940).
 * ``total_loss``/``actor_loss``/``critic_loss`` read keys the optimizer stats
   never set, so they log as 0 (train.py:995-997).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DSTAT_KEYS = (
    "samples", "augmented_samples", "reward_mean", "reward_var",
    "zero_reward_pct", "advantage_mean", "advantage_var", "advantage_l2",
    "adv_min", "adv_max", "G_norm_mean", "G_norm_std", "G_norm_min",
    "G_norm_max", "G_raw_std", "V_std", "A_std", "var_reduction",
    "explained_var", "avg_score", "median_score", "avg_episode_return",
)


def device_stats(traj, adv, aug_valid, aug_points, axis_name=None,
                 episode_scores=None, episode_mask=None,
                 ep_start_mask=None) -> dict:
    """Array reductions over the rollout. ``traj``: Trajectory; ``adv``: the
    dict from advantage.compute; ``aug_*``: augmented-step fields.

    With ``axis_name`` (per-shard under shard_map) every statistic is GLOBAL:
    weighted moments psum'd, extrema pmax/pmin'd, and the episode-score
    vector all_gather'd so avg/median match the single-chip computation over
    the full batch (each shard contributes its own augmented pseudo-episode,
    matching the reference quirk once per shard).

    PACKED mode overrides: a packed lane holds many episodes, so the episode
    stats come from completion records instead of per-lane summaries —
    ``episode_scores``/``episode_mask`` (flat, mask True where an episode
    completed) replace ``traj.total_points``, and ``ep_start_mask`` (flat,
    aligned with the flattened (T, N) grid) replaces ``traj.valid[0]`` for
    the per-episode first-move return G_0."""
    ar = (lambda x: jax.lax.psum(x, axis_name)) if axis_name else (lambda x: x)

    def wstats(x, w, n):
        mean = ar(jnp.sum(x * w)) / n
        var = ar(jnp.sum(jnp.square(x - mean) * w)) / n
        return mean, var

    w = traj.valid.astype(jnp.float32)  # (T, N) real steps only
    n = jnp.maximum(ar(jnp.sum(w)), 1.0)

    reward_mean, reward_var = wstats(adv["reward"], w, n)
    adv_mean, adv_var = wstats(adv["advantage"], w, n)
    future_mean, future_var = wstats(adv["G_raw"], w, n)
    fnorm_mean, fnorm_var = wstats(adv["G_norm"], w, n)
    v_mean, v_var = wstats(traj.value_pred, w, n)

    zero_reward_pct = ar(jnp.sum((adv["reward"] == 0.0) * w)) / n * 100.0

    # Episode scores INCLUDING the augmented pseudo-episode (the quirk).
    aug_score = jnp.sum(jnp.where(aug_valid, aug_points, 0))
    if episode_scores is not None:
        # Packed mode: masked stats over episode-completion records. The
        # median sorts non-completions to +inf and indexes by the true count.
        smask = jnp.concatenate(
            [episode_mask, jnp.ones((1,), jnp.bool_)])
        scores = jnp.concatenate(
            [episode_scores, aug_score[None]]).astype(jnp.float32)
        if axis_name:
            scores = jax.lax.all_gather(scores, axis_name).reshape(-1)
            smask = jax.lax.all_gather(smask, axis_name).reshape(-1)
        n_done = jnp.maximum(jnp.sum(smask.astype(jnp.float32)), 1.0)
        avg_score = jnp.sum(jnp.where(smask, scores, 0.0)) / n_done
        ordered = jnp.sort(jnp.where(smask, scores, jnp.inf))
        median_score = ordered[jnp.minimum(
            (n_done.astype(jnp.int32)) // 2, ordered.shape[0] - 1)]
        median_score = jnp.where(jnp.isfinite(median_score), median_score, 0.0)
    else:
        scores = jnp.concatenate([traj.total_points, aug_score[None]]).astype(jnp.float32)
        if axis_name:
            scores = jax.lax.all_gather(scores, axis_name).reshape(-1)
        scores = jnp.sort(scores)
        n_ep = scores.shape[0]
        avg_score = jnp.mean(scores)
        median_score = jnp.where(
            n_ep % 2 == 1, scores[n_ep // 2],
            (scores[n_ep // 2 - 1] + scores[n_ep // 2]) / 2.0,
        )

    # G_0 per real episode (first move's raw RTG), train.py:972-975.
    if ep_start_mask is not None:
        g0 = ep_start_mask.astype(jnp.float32)
        ep_returns = jnp.where(ep_start_mask, adv["G_raw"].reshape(-1), 0.0)
        avg_episode_return = ar(jnp.sum(ep_returns)) / jnp.maximum(
            ar(jnp.sum(g0)), 1.0)
    else:
        has_moves = traj.valid[0]
        ep_returns = jnp.where(has_moves, adv["G_raw"][0], 0.0)
        avg_episode_return = ar(jnp.sum(ep_returns)) / jnp.maximum(
            ar(jnp.sum(has_moves.astype(jnp.float32))), 1.0
        )

    amax = (lambda x: jax.lax.pmax(x, axis_name)) if axis_name else (lambda x: x)
    amin = (lambda x: jax.lax.pmin(x, axis_name)) if axis_name else (lambda x: x)
    big = jnp.float32(1e30)
    adv_masked_min = amin(jnp.min(jnp.where(traj.valid, adv["advantage"], big)))
    adv_masked_max = amax(jnp.max(jnp.where(traj.valid, adv["advantage"], -big)))
    g_masked_min = amin(jnp.min(jnp.where(traj.valid, adv["G_norm"], big)))
    g_masked_max = amax(jnp.max(jnp.where(traj.valid, adv["G_norm"], -big)))

    fnorm_std = jnp.sqrt(fnorm_var)
    adv_std = jnp.sqrt(adv_var)
    variance_reduction = jnp.where(
        fnorm_std > 0, (fnorm_std - adv_std) / fnorm_std * 100.0, 0.0
    )
    explained_var = jnp.where(fnorm_var > 0, 1.0 - adv_var / fnorm_var, 0.0)

    return dict(
        samples=n,
        augmented_samples=ar(jnp.sum(aug_valid.astype(jnp.int32))),
        reward_mean=reward_mean,
        reward_var=reward_var,
        zero_reward_pct=zero_reward_pct,
        advantage_mean=adv_mean,
        advantage_var=adv_var,
        advantage_l2=jnp.sqrt(ar(jnp.sum(jnp.square(adv["advantage"]) * w))),
        adv_min=adv_masked_min,
        adv_max=adv_masked_max,
        G_norm_mean=fnorm_mean,
        G_norm_std=fnorm_std,
        G_norm_min=g_masked_min,
        G_norm_max=g_masked_max,
        G_raw_std=jnp.sqrt(future_var),
        V_std=jnp.sqrt(v_var),
        A_std=adv_std,
        var_reduction=variance_reduction,
        explained_var=explained_var,
        avg_score=avg_score,
        median_score=median_score,
        avg_episode_return=avg_episode_return,
    )


def assemble_metrics(dstats: dict, opt_stats: dict, *, highest_score,
                     ema_avg_score, ema_pct_512, ema_pct_1024, ema_pct_2048,
                     batch_pct_512, batch_pct_1024, batch_pct_2048,
                     ema_explained_var, current_beta, lr) -> dict:
    """Final metric dict with the reference's exact key set/order."""
    return {
        "samples": int(dstats["samples"]),
        "augmented_samples": int(dstats["augmented_samples"]),
        "actor_loss": 0,  # reference logs keys its stats never set
        "critic_loss": 0,
        "total_loss": 0,
        "policy_loss": float(opt_stats["policy_loss"]),
        "entropy_loss": float(opt_stats["entropy_loss"]),
        "value_loss": float(opt_stats["value_loss"]),
        "actor_grad_norm": 0,
        "critic_grad_norm": 0,
        "grad_norm": float(opt_stats["grad_norm"]),
        "entropy": float(opt_stats["entropy"]),
        "peak_score": highest_score,
        "avg_score": float(dstats["avg_score"]),
        "ema_avg_score": ema_avg_score,
        "median_score": float(dstats["median_score"]),
        "avg_episode_return": float(dstats["avg_episode_return"]),
        "pct_512": batch_pct_512,
        "ema_pct_512": ema_pct_512,
        "pct_1024": batch_pct_1024,
        "ema_pct_1024": ema_pct_1024,
        "pct_2048": batch_pct_2048,
        "ema_pct_2048": ema_pct_2048,
        "reward_var": float(dstats["reward_var"]),
        "reward_mean": float(dstats["reward_mean"]),
        "zero_reward_pct": float(dstats["zero_reward_pct"]),
        "advantage_mean": float(dstats["advantage_mean"]),
        "advantage_var": float(dstats["advantage_var"]),
        "advantage_l2": float(dstats["advantage_l2"]),
        "adv_min": float(dstats["adv_min"]),
        "adv_max": float(dstats["adv_max"]),
        "G_norm_mean": float(dstats["G_norm_mean"]),
        "G_norm_std": float(dstats["G_norm_std"]),
        "G_norm_min": float(dstats["G_norm_min"]),
        "G_norm_max": float(dstats["G_norm_max"]),
        "G_raw_std": float(dstats["G_raw_std"]),
        "V_std": float(dstats["V_std"]),
        "A_std": float(dstats["A_std"]),
        "var_reduction": float(dstats["var_reduction"]),
        "explained_var": float(dstats["explained_var"]),
        "ema_explained_var": ema_explained_var,
        "kl_total": float(opt_stats["kl_total"]),
        "kl_average": float(opt_stats["kl_average"]),
        "kl_max": float(opt_stats["kl_max"]),
        "actor_lr": lr,
        "critic_lr": 0,
        "current_beta": current_beta,
    }
