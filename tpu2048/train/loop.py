"""Training loop: fused rollout -> advantage -> augmented minibatch PPO, with
the reference's full observability surface (train.py:1284-1930 re-architected).

Per train step the device runs TWO jitted programs (the host only logs):
  1. rollout_fn      — N full games inside one while_loop (algo/rollout.py)
  2. process_fn      — advantage + augmentation + minibatched PPO epochs with
                       per-minibatch optimizer stepping + all batch statistics

plus, at print/eval cadence, a jitted full-heuristics pass over the best
episode (for breakdown tables / viz JSON) and a jitted seeded eval rollout.

Fixes over the reference, on purpose (each documented):
  * resume from a full train-state checkpoint (reference has none, §5.4);
  * upsample_ratio=0 does not crash (reference train.py:1716 IndexError);
  * GameURM is trainable (reference disables it, train.py:1528-1532).
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..algo import advantage as A
from ..algo import augment as AUG
from ..algo import rollout as R
from ..algo import update as U
from ..env import engine, heuristics
from ..models import MLPConfig, URMConfig, mlp, urm
from ..ops import OptimizerConfig, schedules
from ..ops import optimizer as opt
from ..utils import MetricLogger, printing, stats as S, viz_export
from . import checkpoint as CKPT

DEFAULT_SCAN_CAP = 4096  # longest recorded reference game: 1249 moves


@dataclass
class TrainConfig:
    """Flag surface mirroring the reference CLI (train.py:1285-1455)."""

    steps: int = 1000
    learning_rate: float = 0.001
    critic_lr: float = 0.001
    gamma: float = 0.99
    entropy_strength: float = 0.1
    critic_strength: float = 1.0
    num_episodes: int = 1
    batch_size: int = 1
    ppo_epochs: int = 1
    max_steps: Optional[int] = None
    hidden_size: int = 64
    num_layers: int = 2
    model_type: str = "mlp"
    num_heads: int = 4
    num_loops: int = 4
    num_truncated_loops: int = 1
    dropout: float = 0.1
    print_frequency: int = 10
    show_last_steps: int = 0
    points_weight: float = 0.0
    smoothness_weight: float = 0.0
    max_tile_weight: float = 0.0
    corner_weight: float = 0.0
    adjacency_weight: float = 0.0
    chain_weight: float = 0.0
    monotonicity_weight: float = 0.0
    emptiness_weight: float = 0.0
    topological_weight: float = 0.0
    win_bonus: float = 0.0
    warmup_steps: int = 200
    rtg_beta: float = 0.9
    viz_dir: Optional[str] = None
    log_dir: Optional[str] = None
    use_wandb: bool = False
    wandb_project: Optional[str] = "2048-rl"
    wandb_run_name: Optional[str] = None
    eval_freq: Optional[int] = None
    eval_games: int = 100
    decouple_critic: bool = False
    upsample_ratio: float = 0.0
    export_demo: bool = False
    checkpoint_dir: Optional[str] = "checkpoints"
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.01
    adaptive_beta: bool = False
    target_entropy: float = 0.7
    beta_min: float = 0.001
    beta_max: float = 1.0
    beta_lr: float = 0.01
    # framework-native additions
    seed: int = 0
    resume: bool = False
    kl_diagnostic: bool = True
    scan_cap: int = DEFAULT_SCAN_CAP
    checkpoint_freq: Optional[int] = None  # full-state checkpoint cadence
    mesh_data: int = 1  # >1: SPMD data-parallel trainer over an N-device mesh
    eval_env_seed: int = 12345  # base env-stream seed for eval-in-train
    # True = the IDENTICAL spawn stream every eval (reference-analog
    # semantics); False (default) folds the eval round index into the env
    # key so best-checkpoint selection can't overfit one spawn sequence.
    eval_fixed_stream: bool = False
    # Overlap each step's host work (scalar fetch/logging) with the NEXT
    # step's device execution. Bit-identical numerics — reads are deferred,
    # not staled; auto-disabled under adaptive_beta (see the train loop).
    pipeline: bool = True
    # Expert iteration (net-new): rollout actions come from expert_depth-ply
    # expectimax search with live-moment coefs; the learner imitates them
    # (cross-entropy) instead of PPO. See algo/search.py, losses.imitation_loss.
    expert_iter: bool = False
    expert_depth: int = 1
    # Fraction of envs whose moves the expert TAKES; the rest are driven by
    # the sampled policy (all envs get expert labels — DAgger). 1.0 = pure
    # expert states; <1 trains on the learner's own distribution too.
    expert_mix: float = 0.5
    # Distillation temperature in RETURN-STD units for the soft expert
    # target softmax(scores / (sigma * tau)); 0 = hard one-hot labels.
    expert_tau: float = 0.02
    # Sharp CE: imitate one-hot(argmax of the soft target) while the soft
    # target still supplies the decisiveness gap weight. Default ON —
    # distilling the soft target verbatim measurably collapses solo sampled
    # play (losses.imitation_loss docstring).
    expert_sharp: bool = True
    # Checkpoint dir of a FROZEN teacher (params via best_model, coefs via
    # its train_state moments). Unset = the live learner drives the search,
    # which couples teacher quality to student drift and measurably implodes
    # (algo/rollout.py::rollout docstring). Set this for stable distillation.
    expert_src: Optional[str] = None
    # KL(anchor || pi) trust-region strength vs the policy at run start
    # (post-resume warm start). 0 = off. Guards distillation against trading
    # away warm-start competence on underrepresented states (algo/update.py).
    anchor_kl: float = 0.0
    # Run the expert's leaf/value forwards in bfloat16 (~2x expert-rollout
    # throughput; labels flip only on gap~0 ties — rollout docstring).
    expert_bf16: bool = False
    # Packed (auto-reset) rollout — the throughput mode (algo/rollout.py::
    # rollout_packed): `lanes` persistent environments advance exactly
    # `horizon` steps per train step; finished games reset in-place and env
    # state carries across steps, so every lane is busy every trip (the
    # exact-episodes rollout idles at 31-38% occupancy waiting for the
    # longest game — BENCH.md). Episodes cut at a chunk boundary are
    # bootstrapped with the critic (advantage.compute_packed) — the one
    # deviation from the reference's full-episode returns, which is why the
    # exact mode stays the default for curve parity.
    packed: bool = False
    lanes: int = 0  # 0 -> num_episodes
    horizon: int = 512  # env steps per lane per train step
    # Device-side best-episode recorder for packed runs (algo/capture.py):
    # packed lanes hold episodes that span chunk boundaries, so without it a
    # packed run can't feed the printers/viz/demo export at all (the round-4
    # gap: URM trained packed-only had no showcase game). Costs
    # lanes x scan_cap x 41 B of HBM (~430 MB at 4096 lanes); single-process
    # mesh_data=1 only — the sharded/multiprocess paths keep it off.
    packed_capture: bool = True

    @property
    def packed_lanes(self) -> int:
        return self.lanes or self.num_episodes

    @property
    def rollout_cap(self) -> int:
        return self.max_steps if self.max_steps else self.scan_cap

    @property
    def reward_weights(self) -> A.RewardWeights:
        return A.RewardWeights(
            points=self.points_weight,
            smoothness=self.smoothness_weight,
            max_tile=self.max_tile_weight,
            corner=self.corner_weight,
            adjacency=self.adjacency_weight,
            chain=self.chain_weight,
            monotonicity=self.monotonicity_weight,
            emptiness=self.emptiness_weight,
            topological=self.topological_weight,
            win_bonus=self.win_bonus,
        )


def build_model(cfg: TrainConfig):
    """(model_config, init_fn, apply_eval, apply_train, labels_fn)."""
    if cfg.model_type.lower() == "mlp":
        mc = MLPConfig(hidden_dim=cfg.hidden_size, num_layers=cfg.num_layers,
                       dropout=cfg.dropout, decouple_critic=cfg.decouple_critic)
        apply_eval = lambda p, x: mlp.apply(p, mc, x)
        apply_train = lambda p, x, rng: mlp.apply(p, mc, x, train=True, rng=rng)
        return mc, partial(mlp.init, config=mc), apply_eval, apply_train, mlp.param_labels
    if cfg.model_type.lower() == "urm":
        mc = URMConfig(hidden_dim=cfg.hidden_size, num_layers=cfg.num_layers,
                       num_heads=cfg.num_heads, dropout=cfg.dropout,
                       num_loops=cfg.num_loops,
                       num_truncated_loops=cfg.num_truncated_loops)
        apply_eval = lambda p, x: urm.apply(p, mc, x)
        apply_train = lambda p, x, rng: urm.apply(p, mc, x, train=True, rng=rng)
        return mc, partial(urm.init, config=mc), apply_eval, apply_train, urm.param_labels
    raise ValueError(f"Unknown model type: {cfg.model_type}. Use 'mlp' or 'urm'.")


_EXTRA_SCALARS = ("sched_mult", "batch_max_score", "batch_avg_score",
                  "pct_512", "pct_1024", "pct_2048", "best_idx", "env_steps")
SCALAR_KEYS = tuple(sorted(
    list(S.DSTAT_KEYS) + list(U.OptimizeStats._fields) + list(_EXTRA_SCALARS)
))


def make_process_fn(cfg: TrainConfig, apply_train, labels, optimize_fn,
                    axis_name: Optional[str] = None,
                    num_envs_local: Optional[int] = None, _jit: bool = True):
    """One post-rollout program: advantage -> augment -> PPO epochs -> stats.
    Returns (params, opt_state, moments, outputs-dict); the packed scalar
    vector is ordered by the static SCALAR_KEYS.

    ``axis_name``/``num_envs_local``: run per-shard under shard_map over a
    data-parallel mesh axis — the SAME code path as single-chip, with the
    batch moments, gradients and every logged statistic reduced globally
    (``optimize_fn`` must be built with the same ``axis_name``). The sharded
    builder (parallel/train_step.py) passes ``_jit=False`` and wraps this body
    in shard_map itself.

    ``cfg.packed``: the trajectory is a PackedTrajectory (auto-reset lanes);
    advantage runs the segment-aware bootstrapped pipeline and the episode
    statistics come from per-step completion records."""
    packed = cfg.packed
    if packed:
        T, N = cfg.horizon, num_envs_local or cfg.packed_lanes
    else:
        T, N = cfg.rollout_cap, num_envs_local or cfg.num_episodes
    num_slots = int(np.ceil(T * N * max(cfg.upsample_ratio, 0.0))) if cfg.upsample_ratio > 0 else 0
    weights = cfg.reward_weights
    ar = (lambda x: jax.lax.psum(x, axis_name)) if axis_name else (lambda x: x)
    amax = (lambda x: jax.lax.pmax(x, axis_name)) if axis_name else (lambda x: x)

    def process(params, opt_state, traj: R.Trajectory, moments, key, train_step,
                beta):
        sched_mult = schedules.cosine_with_warmup(
            train_step - 1, cfg.warmup_steps, cfg.steps
        )
        if packed:
            adv = A.compute_packed(
                traj.points, traj.mono_before, traj.mono_after,
                traj.empt_before, traj.empt_after, traj.value_pred,
                traj.valid, traj.done_here, traj.boot_value, weights,
                cfg.gamma, moments, cfg.rtg_beta, train_step,
                axis_name=axis_name,
            )
        else:
            adv = A.compute(
                traj.points, traj.mono_before, traj.mono_after, traj.empt_before,
                traj.empt_after, traj.value_pred, traj.valid, weights, cfg.gamma,
                moments, cfg.rtg_beta, train_step, axis_name=axis_name,
            )

        S_real = T * N
        flat_valid = traj.valid.reshape(S_real)
        fb = lambda x: x.reshape((S_real,) + x.shape[2:])

        if num_slots > 0:
            k_aug, key = jax.random.split(key)
            n_valid = jnp.sum(flat_valid.astype(jnp.int32))
            num_to_sample = jnp.minimum(
                (n_valid.astype(jnp.float32) * cfg.upsample_ratio).astype(jnp.int32),
                num_slots,
            )
            aug_plan = AUG.plan(k_aug, num_slots, num_to_sample, flat_valid)
            # Lazy-augmentation dataset: the real rows plus the compact plan;
            # the learner materializes each minibatch's augmented rows on the
            # fly (update.py) — no full-capacity transformed copies.
            dataset = U.Dataset(
                board_before=fb(traj.board_before),
                action=fb(traj.target_action).astype(jnp.int32),
                action_mask=fb(traj.action_mask),
                advantage=fb(adv["advantage"]),
                G_norm=fb(adv["G_norm"]),
                logprobs=fb(traj.logprobs),
                target_probs=fb(traj.target_probs),
                valid=jnp.concatenate([flat_valid, aug_plan.valid]),
                aug_src=aug_plan.src,
                aug_tf=aug_plan.transform,
            )
            aug_valid = aug_plan.valid
            aug_points = jnp.take(fb(traj.points), aug_plan.src)
        else:
            dataset = U.Dataset(
                board_before=fb(traj.board_before),
                action=fb(traj.target_action).astype(jnp.int32),
                action_mask=fb(traj.action_mask),
                advantage=fb(adv["advantage"]),
                G_norm=fb(adv["G_norm"]),
                logprobs=fb(traj.logprobs),
                target_probs=fb(traj.target_probs),
                valid=flat_valid,
            )
            aug_valid = jnp.zeros((1,), jnp.bool_)
            aug_points = jnp.zeros((1,), jnp.int32)

        k_opt, key = jax.random.split(key)
        new_params, new_opt_state, ostats = optimize_fn(
            params, opt_state, dataset, k_opt, beta, cfg.critic_strength,
            sched_mult,
        )

        if packed:
            # Episode stats over this chunk's COMPLETION records (a packed
            # lane holds many episodes; completions happen mid-buffer).
            flat_done = traj.done_here.reshape(-1)
            dstats = S.device_stats(
                traj, adv, aug_valid, aug_points, axis_name=axis_name,
                episode_scores=traj.ep_score.reshape(-1),
                episode_mask=flat_done,
                ep_start_mask=traj.ep_start.reshape(-1),
            )
            n_done = jnp.maximum(ar(jnp.sum(flat_done.astype(jnp.float32))), 1.0)
            scalars = dict(dstats)
            scalars.update(ostats._asdict())
            scalars.update(
                sched_mult=sched_mult,
                batch_max_score=amax(jnp.max(traj.ep_score)),
                batch_avg_score=ar(jnp.sum(traj.ep_score.astype(jnp.float32))) / n_done,
                pct_512=ar(jnp.sum(traj.ep_tile >= 512)) / n_done * 100.0,
                pct_1024=ar(jnp.sum(traj.ep_tile >= 1024)) / n_done * 100.0,
                pct_2048=ar(jnp.sum(traj.ep_tile >= 2048)) / n_done * 100.0,
                # A packed chunk has no per-lane "best episode" to fetch
                # (episodes live mid-buffer); the loop skips episode fetches.
                best_idx=jnp.int32(0),
                env_steps=ar(jnp.sum(traj.valid.astype(jnp.int32))),
            )
        else:
            dstats = S.device_stats(traj, adv, aug_valid, aug_points,
                                    axis_name=axis_name)
            max_tiles = engine.max_tile_value(traj.final_board.astype(jnp.int32))
            n_ep = ar(jnp.float32(N))  # global episode count across shards
            if axis_name:
                # Global best episode: index into the gathered
                # (data-concatenated) score vector — the same layout the
                # sharded traj comes back in.
                all_scores = jax.lax.all_gather(traj.total_points, axis_name)
                best_idx = jnp.argmax(all_scores.reshape(-1))
            else:
                best_idx = jnp.argmax(traj.total_points)
            scalars = dict(dstats)
            scalars.update(ostats._asdict())
            scalars.update(
                sched_mult=sched_mult,
                batch_max_score=amax(jnp.max(traj.total_points)),
                batch_avg_score=ar(jnp.sum(traj.total_points)) / n_ep,
                pct_512=ar(jnp.sum(max_tiles >= 512)) / n_ep * 100.0,
                pct_1024=ar(jnp.sum(max_tiles >= 1024)) / n_ep * 100.0,
                pct_2048=ar(jnp.sum(max_tiles >= 2048)) / n_ep * 100.0,
                best_idx=best_idx,
                env_steps=ar(jnp.sum(traj.num_moves)),
            )
        # One packed vector -> ONE host transfer per train step (the tunnel
        # round trip per scalar would otherwise dominate wall clock).
        assert sorted(scalars) == list(SCALAR_KEYS), sorted(scalars)
        packed_scalars = jnp.stack(
            [jnp.asarray(scalars[k], jnp.float32) for k in SCALAR_KEYS]
        )
        outputs = dict(scalars=packed_scalars, advantage=adv["advantage"])
        return new_params, new_opt_state, adv["new_moments"], outputs

    return jax.jit(process) if _jit else process


def make_episode_heuristics_fn():
    """Jitted full-heuristics deltas for one episode's (T,4,4) board sequence
    (used only at print cadence — the hot rollout computes just the two live
    potentials)."""

    @jax.jit
    def fn(board_before, action):
        b = board_before.astype(jnp.int32)
        before = heuristics.full_suite(b)
        anchor = heuristics.choose_anchor_corner(b)
        moves = engine.all_moves(b)
        sel = action.astype(jnp.int32)[None, :, None, None]
        moved = jnp.squeeze(jnp.take_along_axis(moves.boards, sel, axis=0), axis=0)
        after = dict(heuristics.full_suite(moved, anchor=anchor))
        after["topological"] = heuristics.topological_score(moved, anchor)
        before = dict(before)
        before["topological"] = heuristics.topological_score(b, anchor)
        return {
            "smoothness_delta": after["smoothness"] - before["smoothness"],
            "corner_delta": after["corner"] - before["corner"],
            "adjacency_delta": after["adjacency"] - before["adjacency"],
            "chain_delta": after["chain"] - before["chain"],
            "topological_delta": after["topological"] - before["topological"],
        }

    return fn


def fetch_episode(traj: R.Trajectory, advantage_tn, idx: int,
                  heur_fn=None) -> dict:
    """Materialize one episode as the host-side dict the printers/exporters
    consume (the reference's EpisodeData shape, train.py:123-177)."""
    n = int(traj.num_moves[idx])
    sl = lambda x: np.asarray(x[:n, idx])
    board_before = sl(traj.board_before).astype(int)
    board_after = sl(traj.board_after).astype(int)
    action = sl(traj.action).astype(int)
    points = sl(traj.points).astype(int)
    entropy = sl(traj.entropy)
    advv = np.asarray(advantage_tn[:n, idx]) if advantage_tn is not None else np.zeros(n)
    mono_b, mono_a = sl(traj.mono_before), sl(traj.mono_after)
    empt_b, empt_a = sl(traj.empt_before), sl(traj.empt_after)
    max_created = sl(traj.max_created).astype(int)

    heur = None
    if heur_fn is not None:
        full = heur_fn(traj.board_before[:, idx], traj.action[:, idx])
        heur = {k: np.asarray(v[:n]) for k, v in full.items()}

    moves = []
    for t in range(n):
        m = {
            "selected_direction": int(action[t]),
            "state_before": board_before[t].tolist(),
            "result_state": board_after[t].tolist(),
            "points_earned": int(points[t]),
            "entropy": float(entropy[t]),
            "advantage": float(advv[t]),
            "max_tile_created": int(max_created[t]),
            "monotonicity_before": float(mono_b[t]),
            "monotonicity_after": float(mono_a[t]),
            "emptiness_before": float(empt_b[t]),
            "emptiness_after": float(empt_a[t]),
        }
        if heur is not None:
            for k in ("smoothness_delta", "corner_delta", "adjacency_delta",
                      "chain_delta", "topological_delta"):
                m[k] = float(heur[k][t])
        moves.append(m)
    return {
        "moves": moves,
        "total_points": int(traj.total_points[idx]),
        "total_steps": int(traj.total_steps[idx]),
        "final_state": np.asarray(traj.final_board[idx]).astype(int).tolist(),
    }


def make_packed_mono_fn():
    """Jitted recomputation of the two live potentials for a captured packed
    episode's (T, 4, 4) boards. The packed recorder stores only boards/
    actions/points/entropy (keeping its HBM footprint at 41 B/step); the
    mono/empt before/after fields the printers and viz JSON expect are
    recomputed here at fetch cadence, with the reference's pre-spawn "after"
    semantics and terminal zeroing (reference game.py:994-1002,
    train.py:318-322)."""

    @jax.jit
    def fn(board_before, action):
        b = board_before.astype(jnp.int32)
        mono_b = heuristics.monotonicity(b)
        empt_b = heuristics.emptiness(b)
        moves = engine.all_moves(b)
        sel = action.astype(jnp.int32)[None, :, None, None]
        moved = jnp.squeeze(jnp.take_along_axis(moves.boards, sel, axis=0),
                            axis=0)
        maxc = jnp.take_along_axis(
            moves.max_created, action.astype(jnp.int32)[None, :], axis=0)[0]
        return (mono_b, heuristics.monotonicity(moved), empt_b,
                heuristics.emptiness(moved), maxc)

    return fn


def fetch_packed_episode(rec, heur_fn=None, mono_fn=None) -> Optional[dict]:
    """Materialize the packed recorder's committed best episode as the same
    host-side EpisodeData dict :func:`fetch_episode` produces (reference
    train.py:123-177). Returns None until an episode has completed.

    Advantage is reported as 0.0: the recorded episode spans many train
    steps' chunks, so no single advantage buffer covers it (exact mode's
    per-move advantages come from the step that produced the episode)."""
    n = int(rec.best_len)
    if n == 0:
        return None
    true_len = int(rec.best_true_len)
    board_before = np.asarray(rec.best_before[:n]).astype(int)
    board_after = np.asarray(rec.best_after[:n]).astype(int)
    action = np.asarray(rec.best_action[:n]).astype(int)
    points = np.asarray(rec.best_points[:n]).astype(int)
    entropy = np.asarray(rec.best_entropy[:n])

    mono_b = mono_a = empt_b = empt_a = maxc = None
    if mono_fn is not None:
        # Full-cap fixed-shape call: slicing to [:n] here would retrace the
        # jit for every distinct episode length — early training sets a new
        # high almost every step, and per-step recompiles were measured to
        # 5x the whole train step (round 5, expG launch).
        mono_b, mono_a, empt_b, empt_a, maxc = (
            np.asarray(x)[:n] for x in mono_fn(rec.best_before,
                                               rec.best_action))
        if true_len == n:  # untruncated: last move is terminal
            mono_a = mono_a.copy()
            empt_a = empt_a.copy()
            mono_a[-1] = 0
            empt_a[-1] = 0
    heur = None
    if heur_fn is not None:
        full = heur_fn(rec.best_before, rec.best_action)  # fixed shape
        heur = {k: np.asarray(v)[:n] for k, v in full.items()}

    moves = []
    for t in range(n):
        m = {
            "selected_direction": int(action[t]),
            "state_before": board_before[t].tolist(),
            "result_state": board_after[t].tolist(),
            "points_earned": int(points[t]),
            "entropy": float(entropy[t]),
            "advantage": 0.0,
            "max_tile_created": int(maxc[t]) if maxc is not None else 0,
            "monotonicity_before": float(mono_b[t]) if mono_b is not None else 0.0,
            "monotonicity_after": float(mono_a[t]) if mono_a is not None else 0.0,
            "emptiness_before": float(empt_b[t]) if empt_b is not None else 0.0,
            "emptiness_after": float(empt_a[t]) if empt_a is not None else 0.0,
        }
        if heur is not None:
            for k in ("smoothness_delta", "corner_delta", "adjacency_delta",
                      "chain_delta", "topological_delta"):
                m[k] = float(heur[k][t])
        moves.append(m)
    ep = {
        "moves": moves,
        "total_points": int(rec.best_score),
        # Reference accounting: total_steps == len(moves) - 1 for naturally
        # ended games (train.py:335-343).
        "total_steps": true_len - 1,
        "final_state": board_after[-1].tolist(),
    }
    if true_len > n:
        ep["truncated_at"] = n  # recorder cap hit; prefix + final move exact
    return ep


def save_env_carry(ckpt_dir, env_carry, recorder, step: int, lanes: int,
                   sharded_d: int) -> None:
    """Persist the packed EnvCarry so a resumed packed run continues
    ON-POLICY (VERDICT r4 weak-item 5: without this, a resume discards up to
    lanes x horizon = ~0.5M env steps of live state and replays a chunk of
    fresh-board early-game states). Stored as its own crash-atomic
    ``env_carry.npz`` next to ``train_state.npz`` — train_state's key-path
    template stays unchanged, so old checkpoints load as before.

    The recorder's committed best episode rides along (its per-lane buffers
    do not: lanes x cap x 41 B; the taint mask in capture.mark_resumed covers
    the gap on restore)."""
    ek = env_carry.env_key
    if jax.dtypes.issubdtype(ek.dtype, jax.dtypes.prng_key):
        ek = jax.random.key_data(ek)
    tree = dict(boards=env_carry.boards, env_key_data=ek,
                ep_points=env_carry.ep_points, ep_moves=env_carry.ep_moves)
    if recorder is not None:
        tree.update(
            best_before=recorder.best_before, best_after=recorder.best_after,
            best_action=recorder.best_action,
            best_points=recorder.best_points,
            best_entropy=recorder.best_entropy,
            best_score=recorder.best_score, best_len=recorder.best_len,
            best_true_len=recorder.best_true_len,
        )
    CKPT.save_checkpoint(
        ckpt_dir, "env_carry", arrays_tree=tree,
        manifest=dict(train_step=step, lanes=lanes, sharded_d=sharded_d,
                      has_recorder=recorder is not None),
    )


def load_env_carry(ckpt_dir, lanes: int, cap: int, mesh=None, logger=None):
    """Restore (EnvCarry, recorder-best-fields-or-None) saved by
    :func:`save_env_carry`; returns (None, None) when absent or incompatible
    (lane count / mesh layout changed), in which case the caller keeps its
    fresh carry — the documented pre-r5 behavior."""
    import json as _json
    import os.path as _osp
    import zipfile as _zf

    path = _osp.join(ckpt_dir, "env_carry.npz")
    if not _osp.exists(path):
        return None, None
    try:
        data = np.load(path)
        manifest = {}
        if "__manifest__" in data.files:
            manifest = _json.loads(str(data["__manifest__"]))
        if manifest.get("lanes") != lanes:
            if logger:
                logger.print(
                    f"env_carry checkpoint is for {manifest.get('lanes')} "
                    f"lanes, run uses {lanes}: starting from fresh boards")
            return None, None
        d = mesh.shape.get("data", 1) if mesh is not None else 1
        if manifest.get("sharded_d", 1) != d:
            if logger:
                logger.print(
                    "env_carry checkpoint mesh layout changed "
                    f"({manifest.get('sharded_d', 1)} -> {d}): starting "
                    "from fresh boards")
            return None, None
        # save_pytree stores leaves under pytree key paths: "['boards']".
        arrays = {(k[2:-2] if k.startswith("['") and k.endswith("']") else k):
                  np.asarray(data[k])
                  for k in data.files if k != "__manifest__"}
    except (_zf.BadZipFile, OSError, ValueError, KeyError) as e:
        if logger:
            logger.print(f"env_carry checkpoint unreadable ({e}); "
                         "starting from fresh boards")
        return None, None

    def put(x, dtype):
        x = jnp.asarray(x, dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(x, NamedSharding(mesh, P("data")))
        return x

    ek = put(arrays["env_key_data"], jnp.uint32)
    if mesh is None:
        ek = jax.random.wrap_key_data(ek)
    carry = R.EnvCarry(
        boards=put(arrays["boards"], jnp.int32),
        env_key=ek,
        ep_points=put(arrays["ep_points"], jnp.int32),
        ep_moves=put(arrays["ep_moves"], jnp.int32),
    )
    best = None
    if manifest.get("has_recorder") and "best_action" in arrays \
            and arrays["best_action"].shape[0] == cap:
        best = {k: arrays[k] for k in
                ("best_before", "best_after", "best_action", "best_points",
                 "best_entropy", "best_score", "best_len", "best_true_len")}
    return carry, best


EVAL_KEYS = ("avg_score", "max_score", "median_score", "pct_1024",
             "pct_2048", "pct_512")


def make_eval_fn(cfg: TrainConfig, apply_eval):
    """Seeded eval: seeded env stream (like the reference's random.seed(i),
    train.py:227-229 — see rollout docstring), stochastic policy draws.

    By default the eval ROUND index is folded into the env key, so each eval
    sees a fresh (but reproducible) spawn sequence — best-checkpoint selection
    can't overfit one fixed stream. ``eval_fixed_stream=True`` restores the
    reference-analog semantics (the identical stream every eval)."""
    T = cfg.rollout_cap
    G = cfg.eval_games

    @jax.jit
    def eval_rollout(params, key, eval_idx):
        env_key = jax.random.key(cfg.eval_env_seed)
        if not cfg.eval_fixed_stream:
            env_key = jax.random.fold_in(env_key, eval_idx)
        traj = R.rollout(apply_eval, params, key, G, T, env_key=env_key)
        scores = traj.total_points
        max_tiles = engine.max_tile_value(traj.final_board.astype(jnp.int32))
        sorted_scores = jnp.sort(scores)
        n = jnp.float32(G)
        vals = dict(
            max_score=jnp.max(scores),
            avg_score=jnp.sum(scores) / n,
            median_score=sorted_scores[G // 2],
            pct_512=jnp.sum(max_tiles >= 512) / n * 100.0,
            pct_1024=jnp.sum(max_tiles >= 1024) / n * 100.0,
            pct_2048=jnp.sum(max_tiles >= 2048) / n * 100.0,
        )
        return jnp.stack(
            [jnp.asarray(vals[k], jnp.float32) for k in EVAL_KEYS]
        )

    return eval_rollout


def train(cfg: TrainConfig) -> dict:
    """Run training; returns a summary dict (final params under 'params').

    ``cfg.mesh_data > 1`` routes the hot path through the SPMD train step
    (parallel/train_step.py) — the same rollout/process code shard_mapped
    over a ('data',) mesh with global collectives; every host-side feature
    (adaptive beta, eval-in-train, best/full checkpoints, viz export, the
    full metric surface) is shared with the single-chip path below.

    Multi-host: launch the same command on every host with
    --coordinator-address/--num-processes/--process-id (the CLI calls
    jax.distributed.initialize first); the mesh spans all hosts' chips.
    Only process 0 logs and writes checkpoints; per-episode printing/viz is
    skipped because the sharded trajectory is not host-addressable."""
    main_process = jax.process_index() == 0
    multiprocess = jax.process_count() > 1
    # wandb config dict with the reference's key names (train.py:1461-1490)
    # so dashboards/sweeps carry over unchanged.
    train_config = {
        "steps": cfg.steps, "learning_rate": cfg.learning_rate,
        "gamma": cfg.gamma, "beta": cfg.entropy_strength,
        "critic_strength": cfg.critic_strength, "batch_size": cfg.num_episodes,
        "ppo_epochs": cfg.ppo_epochs, "hidden_size": cfg.hidden_size,
        "num_layers": cfg.num_layers, "model_type": cfg.model_type,
        "num_heads": cfg.num_heads, "num_loops": cfg.num_loops,
        "num_truncated_loops": cfg.num_truncated_loops,
        "points_weight": cfg.points_weight,
        "smoothness_weight": cfg.smoothness_weight,
        "max_tile_weight": cfg.max_tile_weight,
        "corner_weight": cfg.corner_weight,
        "adjacency_weight": cfg.adjacency_weight,
        "chain_weight": cfg.chain_weight,
        "monotonicity_weight": cfg.monotonicity_weight,
        "topological_weight": cfg.topological_weight,
        "win_bonus": cfg.win_bonus, "rtg_beta": cfg.rtg_beta,
        "adaptive_beta": cfg.adaptive_beta,
        "target_entropy": cfg.target_entropy, "beta_min": cfg.beta_min,
        "beta_max": cfg.beta_max, "beta_lr": cfg.beta_lr,
    }
    if main_process:
        logger = MetricLogger(
            log_dir=cfg.log_dir,
            experiment_name=f"train_{cfg.model_type}",
            use_wandb=cfg.use_wandb,
            wandb_project=cfg.wandb_project,
            wandb_run_name=cfg.wandb_run_name,
            wandb_config=train_config,
        )
    else:  # non-main hosts stay silent
        class _NullLogger:
            def log(self, *a, **k):
                pass

            def print(self, *a, **k):
                pass

            def close(self):
                pass

        logger = _NullLogger()
    logger.print(f"Using devices: {jax.devices()}")

    model_cfg, init_fn, apply_eval, apply_train, labels_fn = build_model(cfg)
    key = jax.random.key(cfg.seed)
    key, k_init = jax.random.split(key)
    params = init_fn(k_init)  # heads zeroed by default (train.py:1559-1567)
    # The packed env-stream key MUST be split off before the resume load:
    # splitting from the restored key would consume one extra split the
    # uninterrupted run never does, desynchronizing the post-resume rollout
    # RNG chain (bit-exact resume test would catch it). When the env carry is
    # restored from its checkpoint this k_env is simply unused.
    k_env = None
    if cfg.packed:
        key, k_env = jax.random.split(key)
    labels = labels_fn(params)

    opt_cfg = OptimizerConfig(
        learning_rate=cfg.learning_rate, critic_lr=cfg.critic_lr,
        beta1=cfg.beta1, beta2=cfg.beta2, weight_decay=cfg.weight_decay,
    )
    opt_state = opt.init(params, labels)
    moments = A.RtgMoments.initial()

    # --- mutable host state (checkpointable) ---
    # Resume happens BEFORE the step functions are built so the trust-region
    # anchor (below) can close over the warm-started params.
    start_step = 0
    highest_score = 0
    best_eval_avg = 0.0
    ema_decay = 0.001
    emas = dict(avg_score=0.0, pct_512=0.0, pct_1024=0.0, pct_2048=0.0,
                explained_var=0.0)
    current_beta = cfg.entropy_strength
    best_game_episode = None

    if cfg.resume and cfg.checkpoint_dir and CKPT.checkpoint_exists(
        cfg.checkpoint_dir, "train_state"
    ):
        tree = dict(params=params, opt_state=opt_state, moments=moments,
                    key=jax.random.key_data(key))
        tree, manifest = CKPT.load_checkpoint(cfg.checkpoint_dir, "train_state", tree)
        params, opt_state, moments = tree["params"], tree["opt_state"], tree["moments"]
        key = jax.random.wrap_key_data(tree["key"])
        start_step = int(manifest["train_step"]) + 1
        highest_score = manifest.get("highest_score", 0)
        best_eval_avg = manifest.get("best_eval_avg", 0.0)
        emas.update(manifest.get("emas", {}))
        current_beta = manifest.get("current_beta", current_beta)
        logger.print(f"Resumed from step {start_step}")

    # KL trust region vs the policy AS OF RUN START (post-resume/warm-start):
    # the frozen anchor for distillation runs (see algo/update.py docstring).
    anchor = None
    if cfg.anchor_kl > 0.0:
        anchor = (lambda p, x: apply_eval(p, x),
                  jax.tree.map(jnp.asarray, params), cfg.anchor_kl)
        logger.print(f"Anchor KL trust region: strength {cfg.anchor_kl} "
                     "vs the run-start policy")

    if cfg.packed and cfg.expert_iter:
        raise ValueError("--packed does not support --expert-iter (the "
                         "expert searcher needs exact-episode rollouts)")

    # Packed mode: persistent env state threaded across train steps.
    # Checkpointed alongside train_state (save_env_carry) so resumes stay
    # on-policy; incompatible/absent carry checkpoints fall back to fresh
    # boards (one chunk of slightly-off-policy early states).
    env_carry = None
    if cfg.packed:
        logger.print(
            f"Packed rollout: {cfg.packed_lanes} auto-reset lanes x "
            f"{cfg.horizon} steps/train-step "
            f"({cfg.packed_lanes * cfg.horizon} env steps/step, "
            "100% lane occupancy)")

    # Best-episode capture (packed runs only; exact mode slices episodes
    # straight out of the trajectory). Single-process mesh_data=1 path: the
    # recorder's commit step is a global argmax over lanes, which the
    # lane-sharded shard_map carry does not express.
    capture_on = (cfg.packed and cfg.packed_capture and cfg.mesh_data == 1
                  and not multiprocess)
    recorder = None
    if capture_on:
        from ..algo import capture as CAPT

        recorder = CAPT.init_recorder(cfg.packed_lanes, cfg.scan_cap)

    use_mesh = cfg.mesh_data > 1
    if use_mesh:
        from ..parallel import make_mesh, make_sharded_train_step

        mesh = make_mesh(cfg.mesh_data)
        logger.print(f"SPMD data-parallel mesh: {dict(mesh.shape)}")
        fused_step = make_sharded_train_step(
            mesh, cfg, apply_eval, apply_train, labels, opt_cfg, anchor=anchor
        )
        if cfg.packed:
            from ..parallel.train_step import init_sharded_env_carry

            env_carry = init_sharded_env_carry(mesh, k_env, cfg.packed_lanes)
    else:
        if cfg.packed:
            env_carry = R.init_env_carry(k_env, cfg.packed_lanes)
        optimize_fn = U.make_optimize_fn(
            apply_train, labels, opt_cfg, cfg.batch_size, cfg.ppo_epochs,
            kl_diagnostic=cfg.kl_diagnostic,
            objective=(("imitation_sharp" if cfg.expert_sharp else "imitation")
                       if cfg.expert_iter else "ppo"),
            anchor=anchor,
        )
        process_fn = make_process_fn(cfg, apply_train, labels, optimize_fn)
        N, T = cfg.num_episodes, cfg.rollout_cap
        if cfg.expert_iter:
            from ..algo import search as SRCH

            if cfg.expert_src:
                # Frozen teacher: params + denormalization coefs loaded ONCE
                # from a finished checkpoint. The teacher never moves, so the
                # imitation objective is stationary (rollout docstring).
                from .evaluate import load_model_checkpoint, load_search_coefs

                e_params, e_mc, e_mt = load_model_checkpoint(cfg.expert_src)
                e_coefs = load_search_coefs(cfg.expert_src)
                if e_mt == "urm":
                    e_apply = lambda p, x: urm.apply(p, e_mc, x)
                else:
                    e_apply = lambda p, x: mlp.apply(p, e_mc, x)
                logger.print(
                    f"Expert iteration: FROZEN depth-{cfg.expert_depth} "
                    f"expectimax teacher from {cfg.expert_src} "
                    f"(sigma={e_coefs.sigma:.1f}, mu={e_coefs.mu:.1f})")

                def _roll(p, k, m, ts, ep):
                    return R.rollout(apply_eval, p, k, N, T,
                                     expert_depth=cfg.expert_depth,
                                     expert_coefs=e_coefs,
                                     expert_mix=cfg.expert_mix,
                                     expert_tau=cfg.expert_tau,
                                     expert_apply=e_apply,
                                     expert_params=ep,
                                     expert_bf16=cfg.expert_bf16)

                _roll_jit = jax.jit(_roll)
                rollout_fn = lambda p, k, m, ts: _roll_jit(p, k, m, ts,
                                                           e_params)
            else:
                logger.print(
                    f"Expert iteration: depth-{cfg.expert_depth} expectimax "
                    "rollout, imitation + value objective")

                def _roll(p, k, m, ts):
                    coefs = SRCH.coefs_from_moments(
                        m, ts, cfg.points_weight, cfg.monotonicity_weight,
                        cfg.emptiness_weight, cfg.gamma, cfg.rtg_beta)
                    return R.rollout(apply_eval, p, k, N, T,
                                     expert_depth=cfg.expert_depth,
                                     expert_coefs=coefs,
                                     expert_mix=cfg.expert_mix,
                                     expert_tau=cfg.expert_tau,
                                     expert_bf16=cfg.expert_bf16)

                rollout_fn = jax.jit(_roll)
        elif cfg.packed:
            if capture_on:
                rollout_fn = jax.jit(
                    lambda p, k, c, r: R.rollout_packed(
                        apply_eval, p, k, c, cfg.horizon, recorder=r)
                )
            else:
                rollout_fn = jax.jit(
                    lambda p, k, c: R.rollout_packed(apply_eval, p, k, c,
                                                     cfg.horizon)
                )
        else:
            rollout_fn = jax.jit(
                lambda p, k, m, ts: R.rollout(apply_eval, p, k, N, T)
            )
    # Restore the packed env carry (and the recorder's committed best
    # episode) from the checkpoint so the lanes resume on-policy.
    if (cfg.packed and cfg.resume and cfg.checkpoint_dir
            and not multiprocess):
        restored_carry, restored_best = load_env_carry(
            cfg.checkpoint_dir, cfg.packed_lanes, cfg.scan_cap,
            mesh=mesh if use_mesh else None, logger=logger)
        if restored_carry is not None:
            env_carry = restored_carry
            logger.print("Resumed packed env carry "
                         "(lanes continue on-policy)")
            if capture_on:
                recorder = CAPT.mark_resumed(recorder,
                                             restored_carry.ep_moves)
        if restored_best is not None and capture_on:
            recorder = recorder._replace(
                best_before=jnp.asarray(restored_best["best_before"], jnp.int8),
                best_after=jnp.asarray(restored_best["best_after"], jnp.int8),
                best_action=jnp.asarray(restored_best["best_action"], jnp.int8),
                best_points=jnp.asarray(restored_best["best_points"], jnp.int32),
                best_entropy=jnp.asarray(restored_best["best_entropy"],
                                         jnp.float32),
                best_score=jnp.asarray(restored_best["best_score"], jnp.int32),
                best_len=jnp.asarray(restored_best["best_len"], jnp.int32),
                best_true_len=jnp.asarray(restored_best["best_true_len"],
                                          jnp.int32),
            )

    heur_fn = make_episode_heuristics_fn()
    mono_fn = make_packed_mono_fn() if capture_on else None
    eval_fn = make_eval_fn(cfg, apply_eval) if cfg.eval_freq else None

    # Sanity forward on a fresh board (reference train.py:1627-1637).
    from ..models.encoding import encode_boards

    test_boards = engine.reset(jax.random.key(99), (1,))
    tl, tv = apply_eval(params, encode_boards(test_boards))
    logger.print(f"Initial action logits: {np.asarray(tl)}")
    logger.print(f"Initial value logit: {np.asarray(tv)}")

    def save_train_state(step):
        if not cfg.checkpoint_dir or not main_process:
            return
        CKPT.save_checkpoint(
            cfg.checkpoint_dir, "train_state",
            arrays_tree=dict(params=params, opt_state=opt_state,
                             moments=moments, key=jax.random.key_data(key)),
            manifest=dict(
                train_step=step, highest_score=int(highest_score),
                best_eval_avg=float(best_eval_avg), emas=emas,
                current_beta=float(current_beta),
                config=asdict(cfg), model_config=model_cfg.to_dict(),
            ),
        )
        # Multiprocess lanes are not host-addressable from one process;
        # those runs keep the documented fresh-board resume.
        if cfg.packed and env_carry is not None and not multiprocess:
            save_env_carry(cfg.checkpoint_dir, env_carry,
                           recorder if capture_on else None, step,
                           cfg.packed_lanes,
                           cfg.mesh_data if use_mesh else 1)

    t_start = time.time()
    env_steps_total = 0

    # --- host-side pipelining (net-new; the reference is strictly serial) ---
    # JAX dispatch is async, but fetching the step's packed scalars forces a
    # host sync; on a remote-attached TPU the device then sits idle for a full
    # dispatch round trip every step. Instead, dispatch step N+1 FIRST and do
    # step N's host work (scalar fetch, EMAs, logging) while the device runs
    # N+1 — numerics are bit-identical (reads are deferred, nothing is made
    # stale) because the dispatch consumes only device-side state. Steps whose
    # host work feeds back into training (eval + its best-model save, full
    # train-state checkpoints, the final step) are processed synchronously;
    # adaptive beta reads last step's entropy, so it disables pipelining.
    pipeline_ok = cfg.pipeline and not cfg.adaptive_beta

    def is_boundary(ts: int) -> bool:
        if eval_fn and ts > 0 and ts % cfg.eval_freq == 0:
            return True
        if cfg.checkpoint_freq and ts > 0 and ts % cfg.checkpoint_freq == 0:
            return True
        return False

    def finish_step(train_step, out, traj):
        """All host-side work for one completed step: scalar fetch, EMA/beta
        bookkeeping, logging/printing/viz, eval-in-train, checkpoints."""
        nonlocal current_beta, highest_score, env_steps_total
        nonlocal best_game_episode, best_eval_avg, key

        # Single packed transfer of every per-step scalar (tunnel round trips
        # per scalar would dominate wall clock on remote-attached TPUs).
        sc = dict(zip(SCALAR_KEYS, np.asarray(out["scalars"]).tolist()))
        if cfg.adaptive_beta:
            entropy_error = cfg.target_entropy - sc.get("entropy", cfg.target_entropy)
            current_beta = float(
                np.clip(current_beta * (1.0 + cfg.beta_lr * entropy_error),
                        cfg.beta_min, cfg.beta_max)
            )

        batch_max_score = int(sc["batch_max_score"])
        new_high = batch_max_score > highest_score
        highest_score = max(batch_max_score, highest_score)
        env_steps_total += int(sc["env_steps"])

        batch_avg = sc["batch_avg_score"]
        p512, p1024, p2048 = sc["pct_512"], sc["pct_1024"], sc["pct_2048"]
        emas["avg_score"] = (1 - ema_decay) * emas["avg_score"] + ema_decay * batch_avg
        emas["pct_512"] = (1 - ema_decay) * emas["pct_512"] + ema_decay * p512
        emas["pct_1024"] = (1 - ema_decay) * emas["pct_1024"] + ema_decay * p1024
        emas["pct_2048"] = (1 - ema_decay) * emas["pct_2048"] + ema_decay * p2048
        explained = sc["explained_var"]
        emas["explained_var"] = (1 - ema_decay) * emas["explained_var"] + ema_decay * explained

        metrics = S.assemble_metrics(
            sc, sc,
            highest_score=highest_score,
            ema_avg_score=emas["avg_score"],
            ema_pct_512=emas["pct_512"], ema_pct_1024=emas["pct_1024"],
            ema_pct_2048=emas["pct_2048"],
            batch_pct_512=p512, batch_pct_1024=p1024, batch_pct_2048=p2048,
            ema_explained_var=emas["explained_var"],
            current_beta=current_beta,
            lr=cfg.learning_rate * sc["sched_mult"],
        )
        should_print = train_step % cfg.print_frequency == 0
        logger.log(metrics, step=train_step, verbose=should_print)

        best_idx = int(sc["best_idx"])
        # Exact mode slices the best episode straight out of the (T, N)
        # trajectory buffers; packed mode fetches it from the device-side
        # recorder (episodes span chunk boundaries — algo/capture.py).
        # Multiprocess, and sharded packed without capture, have no
        # host-addressable episode to fetch. Under pipelining the recorder
        # may already hold a commit from the following chunk; the fetched
        # episode is then at least as good as the one that set new_high.
        fetchable = not multiprocess and (not cfg.packed or capture_on)
        if cfg.packed and capture_on:
            fetch = lambda heur=None: fetch_packed_episode(
                recorder, heur_fn=heur, mono_fn=mono_fn)
        else:
            fetch = lambda heur=None: fetch_episode(
                traj, out["advantage"], best_idx, heur_fn=heur)
        if new_high and fetchable:
            ep = fetch()
            if ep is not None:
                best_game_episode = ep

        if (should_print or (new_high and cfg.viz_dir)) and fetchable:
            episode = fetch(heur_fn)
            weights = cfg.reward_weights
            if episode is not None and should_print:
                printing.print_episode_breakdown(logger, episode, weights, cfg.gamma)
                if cfg.show_last_steps > 0:
                    printing.print_last_steps(logger, episode, cfg.show_last_steps)
                printing.print_final_state(logger, episode)
            if episode is not None and cfg.viz_dir:
                viz_export.export_episode_visualization(
                    cfg.viz_dir, train_step, episode, weights, cfg.gamma
                )

        if eval_fn and train_step > 0 and train_step % cfg.eval_freq == 0:
            key, k_eval = jax.random.split(key)
            logger.print(f"[Step {train_step}] Evaluating model on {cfg.eval_games} games")
            em = dict(zip(EVAL_KEYS, np.asarray(
                eval_fn(params, k_eval,
                        jnp.int32(train_step // cfg.eval_freq))).tolist()))
            eval_metrics = {
                "eval/max_score": em["max_score"],
                "eval/avg_score": em["avg_score"],
                "eval/median_score": em["median_score"],
                "eval/pct_512": em["pct_512"],
                "eval/pct_1024": em["pct_1024"],
                "eval/pct_2048": em["pct_2048"],
            }
            logger.log(eval_metrics, step=train_step)
            logger.print(
                f"Eval Results - Max: {em['max_score']:.0f}, Avg: {em['avg_score']:.1f}, "
                f"Median: {em['median_score']:.0f}"
            )
            logger.print(
                f"Tiles Reached - 512: {em['pct_512']:.1f}%, 1024: {em['pct_1024']:.1f}%, "
                f"2048: {em['pct_2048']:.1f}%"
            )
            if em["avg_score"] > best_eval_avg and cfg.checkpoint_dir:
                best_eval_avg = em["avg_score"]
                if main_process:
                    CKPT.save_checkpoint(
                        cfg.checkpoint_dir, "best_model",
                        arrays_tree=dict(params=params),
                        manifest=dict(
                            config=model_cfg.to_dict(), model_type=cfg.model_type,
                            eval_avg_score=best_eval_avg, train_step=train_step,
                        ),
                    )
                logger.print(
                    f"New best model saved (avg score: {best_eval_avg:.1f}) to "
                    f"{cfg.checkpoint_dir}/best_model.npz"
                )

        if cfg.checkpoint_freq and train_step > 0 and train_step % cfg.checkpoint_freq == 0:
            save_train_state(train_step)

    pending = None
    for train_step in range(start_step, cfg.steps):
        if use_mesh:
            key, k_step = jax.random.split(key)
            if cfg.packed:
                params, opt_state, moments, env_carry, traj, out = fused_step(
                    params, opt_state, moments, env_carry, k_step,
                    jnp.int32(train_step + 1), jnp.float32(current_beta),
                )
            else:
                params, opt_state, moments, traj, out = fused_step(
                    params, opt_state, moments, k_step,
                    jnp.int32(train_step + 1), jnp.float32(current_beta),
                )
        else:
            key, k_roll, k_proc = jax.random.split(key, 3)
            if cfg.packed and capture_on:
                traj, env_carry, recorder = rollout_fn(
                    params, k_roll, env_carry, recorder)
            elif cfg.packed:
                traj, env_carry = rollout_fn(params, k_roll, env_carry)
            else:
                traj = rollout_fn(params, k_roll, moments,
                                  jnp.int32(train_step + 1))
            params, opt_state, moments, out = process_fn(
                params, opt_state, traj, moments, k_proc,
                jnp.int32(train_step + 1), jnp.float32(current_beta),
            )

        # Step N+1 is now enqueued on the device; do the PREVIOUS step's host
        # work while it runs (see the pipelining comment above).
        if pending is not None:
            finish_step(*pending)
            pending = None
        if (pipeline_ok and not is_boundary(train_step)
                and train_step < cfg.steps - 1):
            pending = (train_step, out, traj)
        else:
            finish_step(train_step, out, traj)

    if pending is not None:  # safety drain (unreachable by construction)
        finish_step(*pending)

    elapsed = time.time() - t_start
    steps_run = cfg.steps - start_step
    if steps_run > 0:
        logger.print(
            f"\nTrained {steps_run} steps, {env_steps_total} env steps in "
            f"{elapsed:.1f}s ({env_steps_total / max(elapsed, 1e-9):.0f} env steps/s)"
        )
        # Guarded by steps_run: a resume whose start_step is already past
        # cfg.steps must NOT overwrite the (further-along) checkpoint with
        # train_step=cfg.steps-1 — doing so resets the step counter that
        # drives the RTG bias correction (1 - beta^step), which near step 0
        # inflates warm-started moments into a negative variance.
        save_train_state(cfg.steps - 1)

    if cfg.export_demo and main_process:
        from . import export as EXP

        logger.print("\nExporting demo assets to web/data/ ...")
        from .evaluate import load_search_coefs

        EXP.export_demo_assets(params, model_cfg, cfg.model_type,
                               best_game_episode, "web/data",
                               search_coefs=load_search_coefs(cfg.checkpoint_dir))
    logger.close()
    return dict(params=params, moments=moments, highest_score=highest_score,
                best_game_episode=best_game_episode, emas=emas,
                env_steps_total=env_steps_total, elapsed=elapsed)
