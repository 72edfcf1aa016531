"""Fused on-device rollout: N games to completion inside one jitted while_loop.

This is the capability the reference *intended* to have but shipped without
(``from batched_rollout import play_games_batched``, train.py:30, module
missing). One iteration = one synchronized step of all N games:

    all_moves (fused 4-direction merge)  ->  action mask + reward preview
    policy forward (eval mode)           ->  masked categorical sample
    transition + spawn                   ->  next boards
    live PBRS potentials (monotonicity, emptiness) before/after the move

matching the per-step record of the reference's play_game_for_episode
(train.py:213-345) — including its quirks: the terminal step zeroes
monotonicity_after/emptiness_after (train.py:318-322), and total_steps counts
len(moves)-1 for naturally-ended games (train.py:335-343).

The loop is a ``lax.while_loop`` writing into preallocated (T, N, ...) buffers,
so compute stops as soon as every game is finished — no wasted tail iterations,
no host round trips mid-rollout.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..env import engine, heuristics
from ..models.encoding import encode_boards

NEG_INF = -jnp.inf


class Trajectory(NamedTuple):
    """(T, N, ...) step records + (N,) episode summaries."""

    board_before: jnp.ndarray  # (T, N, 4, 4) int8 — state_before
    board_after: jnp.ndarray  # (T, N, 4, 4) int8 — result_state (post-spawn)
    action: jnp.ndarray  # (T, N) int8 — the action actually TAKEN
    target_action: jnp.ndarray  # (T, N) int8 — learning target (== action,
    # except expert-iteration rollouts: the expert's argmax even on envs the
    # policy drives — DAgger-style labels on the learner's own distribution)
    target_probs: jnp.ndarray  # (T, N, 4) f32 — soft learning target: a
    # one-hot of target_action, except expert rollouts with expert_tau > 0,
    # where it is softmax(scores / (sigma * tau)) over legal moves. 2048 is
    # full of near-ties (~38% of states have a top1-top2 expectimax gap
    # < 0.01 sigma, median 0.015 sigma), so hard argmax labels are coin flips
    # there; soft targets carry the actual decision margin.
    logprobs: jnp.ndarray  # (T, N, 4) f32 — behavior-policy log-softmax
    action_mask: jnp.ndarray  # (T, N, 4) bool, True = invalid
    value_pred: jnp.ndarray  # (T, N) f32
    entropy: jnp.ndarray  # (T, N) f32
    points: jnp.ndarray  # (T, N) i32 — merge points this move
    preview: jnp.ndarray  # (T, N, 4) i32 — points_possible per direction
    max_created: jnp.ndarray  # (T, N) i8 — max exponent created
    mono_before: jnp.ndarray  # (T, N) i32
    mono_after: jnp.ndarray  # (T, N) i32 (0 on terminal step)
    empt_before: jnp.ndarray  # (T, N) i32
    empt_after: jnp.ndarray  # (T, N) i32 (0 on terminal step)
    valid: jnp.ndarray  # (T, N) bool — step actually played
    done_here: jnp.ndarray  # (T, N) bool — step ended the episode
    # episode-level
    final_board: jnp.ndarray  # (N, 4, 4) int8
    total_points: jnp.ndarray  # (N,) i32
    num_moves: jnp.ndarray  # (N,) i32 — len(moves)
    ended: jnp.ndarray  # (N,) bool — ended naturally (not cap-cut)
    steps_executed: jnp.ndarray  # () i32 — while-loop trip count

    @property
    def total_steps(self) -> jnp.ndarray:
        """Reference accounting: the 1-indexed step counter skips the terminal
        move, so naturally-ended games report len(moves)-1 (train.py:335-343)."""
        return self.num_moves - self.ended.astype(jnp.int32)


def _empty_traj(T: int, N: int) -> dict:
    z = jnp.zeros
    return dict(
        board_before=z((T, N, 4, 4), jnp.int8),
        board_after=z((T, N, 4, 4), jnp.int8),
        action=z((T, N), jnp.int8),
        target_action=z((T, N), jnp.int8),
        target_probs=z((T, N, 4), jnp.float32),
        logprobs=z((T, N, 4), jnp.float32),
        action_mask=z((T, N, 4), jnp.bool_),
        value_pred=z((T, N), jnp.float32),
        entropy=z((T, N), jnp.float32),
        points=z((T, N), jnp.int32),
        preview=z((T, N, 4), jnp.int32),
        max_created=z((T, N), jnp.int8),
        mono_before=z((T, N), jnp.int32),
        mono_after=z((T, N), jnp.int32),
        empt_before=z((T, N), jnp.int32),
        empt_after=z((T, N), jnp.int32),
        valid=z((T, N), jnp.bool_),
        done_here=z((T, N), jnp.bool_),
    )


def masked_policy(logits: jnp.ndarray, invalid_mask: jnp.ndarray) -> tuple:
    """(masked_logits, logprobs, entropy) with the reference's conventions:
    invalid logits -> -inf, logprobs = log_softmax of the masked logits
    (train.py:268-291, 326), entropy over the >0-probability entries."""
    masked = jnp.where(invalid_mask, NEG_INF, logits)
    # Safe fallback for all-invalid rows (finished games): uniform.
    all_invalid = jnp.all(invalid_mask, axis=-1, keepdims=True)
    safe = jnp.where(all_invalid, 0.0, masked)
    logprobs = jax.nn.log_softmax(safe, axis=-1)
    probs = jnp.exp(logprobs)
    plogp = jnp.where(invalid_mask, 0.0, probs * logprobs)
    entropy = -jnp.sum(plogp, axis=-1)
    return safe, logprobs, entropy


def rollout(apply_fn, params, key: jax.Array, num_envs: int, max_steps: int,
            env_key: jax.Array | None = None, greedy: bool = False,
            expert_depth: int = 0, expert_coefs=None,
            expert_mix: float = 1.0, expert_tau: float = 0.0,
            expert_apply=None, expert_params=None,
            expert_bf16: bool = False) -> Trajectory:
    """Play ``num_envs`` games to completion (or ``max_steps``).

    ``apply_fn(params, inputs) -> (logits, value)`` must be the eval-mode
    forward. RNG is split into two independent chains, mirroring the
    reference's split-RNG eval semantics (train.py:227-229 seeds only the
    Python RNG driving resets/spawns, while torch.multinomial stays unseeded):
    ``env_key`` drives resets and tile spawns, ``key`` drives action sampling.
    Passing a fixed ``env_key`` gives a deterministic environment stream with
    stochastic policy draws, exactly the reference's "seeded eval".

    ``greedy=True`` takes argmax over the masked logits instead of sampling
    (invalid actions are -inf so the argmax is always a legal move).

    ``expert_depth > 0`` (expert iteration, net-new): the expert is
    ``expert_depth``-ply expectimax search (algo/search.py) with
    ``expert_coefs`` tying the critic leaves to the trained objective. The
    first ``round(expert_mix * N)`` envs TAKE the expert's action; the rest
    sample from the policy as usual — but EVERY step records the expert's
    argmax as ``target_action``. Training on the learner's own state
    distribution with expert labels is the DAgger correction: pure
    expert-state imitation (expert_mix=1) measurably collapses the policy's
    solo play, because states the imitator reaches on its own were never
    labeled. The policy's logprobs/entropy/value are recorded per step
    regardless.

    ``expert_apply``/``expert_params`` (default: the live policy's): a FROZEN
    teacher for the search. Running the expert on the LEARNER'S live critic
    and moments couples teacher quality to student drift — four live-teacher
    runs at lr 5e-4..5e-5 all imploded the same way (student drifts -> its
    critic/moments miscalibrate -> expert labels degrade -> imitating worse
    labels accelerates the drift). A frozen teacher makes the objective plain
    DAgger against a FIXED expert: supervised, stationary, stable.

    ``expert_bf16=True`` runs the expert's leaf/value forwards in bfloat16.
    The leaf evals dominate expert-rollout wall clock (hundreds of thousands
    of tiny critic forwards per trip); bf16 doubles their MXU rate. Labels
    flip only where the top-2 scores sit within bf16 noise — exactly the
    near-ties whose CE weight the decisiveness gap already sends to ~0.
    """
    T, N = max_steps, num_envs
    e_apply_prep, e_params_prep = expert_apply, expert_params
    if expert_depth > 0 and expert_bf16:
        _inner = expert_apply if expert_apply is not None else apply_fn
        e_apply_prep = lambda p, x: _inner(p, x.astype(jnp.bfloat16))
        e_params_prep = jax.tree.map(
            lambda a: (a.astype(jnp.bfloat16)
                       if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                       else a),
            expert_params if expert_params is not None else params)
    if env_key is None:
        key, env_key = jax.random.split(key)
    env_key, reset_key = jax.random.split(env_key)
    boards0 = engine.reset(reset_key, (N,))
    moves0 = engine.all_moves(boards0)

    buffers = _empty_traj(T, N)
    carry0 = dict(
        t=jnp.zeros((), jnp.int32),
        key=key,
        env_key=env_key,
        boards=boards0,
        moves=moves0,
        alive=jnp.ones((N,), jnp.bool_),
        total_points=jnp.zeros((N,), jnp.int32),
        num_moves=jnp.zeros((N,), jnp.int32),
        ended=jnp.zeros((N,), jnp.bool_),
        final_board=boards0.astype(jnp.int8),
        buffers=buffers,
    )

    def cond(c):
        return jnp.logical_and(c["t"] < T, jnp.any(c["alive"]))

    def body(c):
        t, boards, moves, alive = c["t"], c["boards"], c["moves"], c["alive"]
        key, k_act = jax.random.split(c["key"])
        env_key, k_spawn = jax.random.split(c["env_key"])

        invalid = moves.action_mask  # (N, 4) True = invalid
        enc = encode_boards(boards)
        logits, value = apply_fn(params, enc)
        masked, logprobs, entropy = masked_policy(logits, invalid)
        if expert_depth > 0:
            from . import search as SRCH

            coefs = (expert_coefs if expert_coefs is not None
                     else SRCH.SearchCoefs())
            e_apply = e_apply_prep if e_apply_prep is not None else apply_fn
            e_params = e_params_prep if e_params_prep is not None else params
            scores = SRCH.expectimax_scores(
                e_apply, e_params, boards, moves, coefs, expert_depth
            ).astype(jnp.float32)
            target = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            if expert_tau > 0:
                # Soft distillation target: temperature in sigma units, so a
                # tau-sized fraction of a return-std separates e-fold odds.
                z = scores / (coefs.sigma * expert_tau)
                all_inv = jnp.all(invalid, axis=-1, keepdims=True)
                tprobs = jax.nn.softmax(jnp.where(all_inv, 0.0, z), axis=-1)
                tprobs = jnp.where(invalid, 0.0, tprobs)
            else:
                tprobs = jax.nn.one_hot(target, 4, dtype=jnp.float32)
            n_expert = int(round(expert_mix * N))
            if n_expert >= N:
                action = target
            else:
                sampled = jax.random.categorical(
                    k_act, masked, axis=-1).astype(jnp.int32)
                action = jnp.where(jnp.arange(N) < n_expert, target, sampled)
        elif greedy:
            action = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            target = action
            tprobs = jax.nn.one_hot(target, 4, dtype=jnp.float32)
        else:
            action = jax.random.categorical(k_act, masked, axis=-1).astype(jnp.int32)
            target = action
            tprobs = jax.nn.one_hot(target, 4, dtype=jnp.float32)

        mono_b, empt_b = heuristics.monotonicity(boards), heuristics.emptiness(boards)

        res = engine.step(boards, action, k_spawn, moves=moves)
        # Post-move, PRE-spawn board for the "after" potentials
        # (reference computes them before the random spawn, game.py:994-1002).
        sel = action[None, :, None, None]
        moved = jnp.squeeze(jnp.take_along_axis(moves.boards, sel, axis=0), axis=0)
        mono_a, empt_a = heuristics.monotonicity(moved), heuristics.emptiness(moved)

        done = res.done
        # Terminal-step potential zeroing (train.py:318-322).
        mono_a = jnp.where(done, 0, mono_a)
        empt_a = jnp.where(done, 0, empt_a)

        b = c["buffers"]
        w = alive  # only record for games still running

        def put(name, val):
            b[name] = b[name].at[t].set(
                jnp.where(w.reshape((N,) + (1,) * (val.ndim - 1)), val,
                          b[name][t]))

        put("board_before", boards.astype(jnp.int8))
        put("board_after", res.board.astype(jnp.int8))
        put("action", action.astype(jnp.int8))
        put("target_action", target.astype(jnp.int8))
        put("target_probs", tprobs)
        put("logprobs", logprobs)
        put("action_mask", invalid)
        put("value_pred", value[..., 0])
        put("entropy", entropy)
        put("points", res.reward)
        put("preview", moves.preview_rewards)
        put("max_created", res.max_created.astype(jnp.int8))
        put("mono_before", mono_b)
        put("mono_after", mono_a)
        put("empt_before", empt_b)
        put("empt_after", empt_a)
        put("valid", alive)
        put("done_here", done & alive)

        new_alive = alive & jnp.logical_not(done)
        c = dict(
            t=t + 1,
            key=key,
            env_key=env_key,
            boards=res.board,
            moves=res.moves,
            alive=new_alive,
            total_points=c["total_points"] + jnp.where(alive, res.reward, 0),
            num_moves=c["num_moves"] + alive.astype(jnp.int32),
            ended=c["ended"] | (done & alive),
            final_board=jnp.where(alive[:, None, None], res.board.astype(jnp.int8),
                                  c["final_board"]),
            buffers=b,
        )
        return c

    out = jax.lax.while_loop(cond, body, carry0)
    return Trajectory(
        **out["buffers"],
        final_board=out["final_board"],
        total_points=out["total_points"],
        num_moves=out["num_moves"],
        ended=out["ended"],
        steps_executed=out["t"],
    )


@partial(jax.jit, static_argnums=(0, 3, 4))
def rollout_jit(apply_fn, params, key, num_envs: int, max_steps: int,
                env_key=None):
    return rollout(apply_fn, params, key, num_envs, max_steps, env_key)


# ---------------------------------------------------------------------------
# Packed (auto-reset) rollout — the throughput mode.
#
# The exact-episodes rollout above plays ONE game per lane: every lane then
# idles until the longest game in the batch finishes (measured 31-38% lane
# occupancy at the production configs — BENCH.md round 3), and the while_loop
# trip count is set by the straggler. SURVEY.md §7.1 planned "reset, step ...
# with auto-reset" from the start; this is it. Lanes never idle:
#
#   * a fixed-length ``lax.scan`` (static trip count, no cond evaluation —
#     the most XLA-friendly shape there is) steps N persistent environments
#     for exactly T trips;
#   * a lane whose game ends is reset IN the same trip and keeps playing;
#   * env state (boards + per-lane episode accumulators + the env RNG chain)
#     is carried ACROSS train steps in an :class:`EnvCarry`, so no work is
#     ever discarded — every recorded step is trained on (100% occupancy by
#     construction);
#   * episodes that span a chunk boundary are handled in the advantage stage
#     by bootstrapping the cut tail with the critic's (denormalized) value —
#     ``boot_value`` below; see advantage.compute_packed. This is the one
#     deliberate deviation from the reference's full-episode returns-to-go
#     (exact-episodes mode remains the default for curve parity).
# ---------------------------------------------------------------------------


class EnvCarry(NamedTuple):
    """Persistent environment state threaded across packed rollout chunks."""

    boards: jnp.ndarray  # (N, 4, 4) int32 live boards
    env_key: jax.Array  # spawn/reset RNG chain
    ep_points: jnp.ndarray  # (N,) i32 — running score of the current episode
    ep_moves: jnp.ndarray  # (N,) i32 — running length of the current episode


def init_env_carry(env_key: jax.Array, num_lanes: int) -> EnvCarry:
    env_key, k_reset = jax.random.split(env_key)
    return EnvCarry(
        boards=engine.reset(k_reset, (num_lanes,)),
        env_key=env_key,
        ep_points=jnp.zeros((num_lanes,), jnp.int32),
        ep_moves=jnp.zeros((num_lanes,), jnp.int32),
    )


class PackedTrajectory(NamedTuple):
    """(T, N, ...) step records from a packed rollout chunk. Field names match
    :class:`Trajectory` where the meaning is identical so the downstream
    advantage/augment/learner code is shared; episode summaries are per-STEP
    completion records instead of per-lane (a lane holds many episodes)."""

    board_before: jnp.ndarray  # (T, N, 4, 4) int8
    board_after: jnp.ndarray  # (T, N, 4, 4) int8 (post-spawn, pre-reset)
    action: jnp.ndarray  # (T, N) int8
    target_action: jnp.ndarray  # (T, N) int8 (== action; no expert mode)
    target_probs: jnp.ndarray  # (T, N, 4) f32 one-hot of action
    logprobs: jnp.ndarray  # (T, N, 4) f32
    action_mask: jnp.ndarray  # (T, N, 4) bool, True = invalid
    value_pred: jnp.ndarray  # (T, N) f32
    entropy: jnp.ndarray  # (T, N) f32
    points: jnp.ndarray  # (T, N) i32
    preview: jnp.ndarray  # (T, N, 4) i32
    max_created: jnp.ndarray  # (T, N) i8
    mono_before: jnp.ndarray  # (T, N) i32
    mono_after: jnp.ndarray  # (T, N) i32 (0 on terminal steps — the quirk)
    empt_before: jnp.ndarray  # (T, N) i32
    empt_after: jnp.ndarray  # (T, N) i32 (0 on terminal steps)
    valid: jnp.ndarray  # (T, N) bool — ALL True (packed lanes never idle)
    done_here: jnp.ndarray  # (T, N) bool — step ended an episode
    # episode-completion records (nonzero only where done_here)
    ep_start: jnp.ndarray  # (T, N) bool — step began a fresh episode
    ep_score: jnp.ndarray  # (T, N) i32 — completed episode's total points
    ep_len: jnp.ndarray  # (T, N) i32 — completed episode's move count
    ep_tile: jnp.ndarray  # (T, N) i32 — completed episode's max TILE VALUE
    # chunk-boundary bootstrap
    boot_value: jnp.ndarray  # (N,) f32 — V(s_T) of carry-out boards
    # (normalized space, critic units)
    steps_executed: jnp.ndarray  # () i32 == T


def rollout_packed(apply_fn, params, key: jax.Array, carry: EnvCarry,
                   num_steps: int,
                   greedy: bool = False, recorder=None):
    """Step every lane exactly ``num_steps`` times with auto-reset.

    ``key`` drives action sampling (fresh per chunk, from the train loop's
    chain); the env RNG rides inside ``carry`` so the spawn stream is
    continuous across chunks. Returns the chunk's records plus the carry for
    the next chunk. Every step is a real move on a live board: a fresh reset
    board always has a legal move, and dead boards are replaced in the same
    trip, so ``valid`` is identically True.

    ``recorder``: optional :class:`tpu2048.algo.capture.EpisodeRecorder`.
    When given, every lane's in-flight episode is recorded on device and the
    best completed episode is kept across chunks (packed lanes hold episodes
    that span chunk boundaries, so no single chunk's (T, N) buffers contain
    one — see capture.py). Adds a third return value (the updated recorder).
    """
    N = carry.boards.shape[0]

    def body(c, k_act):
        boards, env_key = c["boards"], c["env_key"]
        ep_points, ep_moves = c["ep_points"], c["ep_moves"]
        rec_in = c.get("recorder")
        env_key, k_spawn, k_reset = jax.random.split(env_key, 3)

        moves = engine.all_moves(boards)
        invalid = moves.action_mask
        enc = encode_boards(boards)
        logits, value = apply_fn(params, enc)
        masked, logprobs, entropy = masked_policy(logits, invalid)
        if greedy:
            action = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        else:
            action = jax.random.categorical(k_act, masked, axis=-1).astype(jnp.int32)

        mono_b = heuristics.monotonicity(boards)
        empt_b = heuristics.emptiness(boards)

        res = engine.step(boards, action, k_spawn, moves=moves)
        # Post-move, PRE-spawn board for the "after" potentials (reference
        # computes them before the random spawn, game.py:994-1002).
        sel = action[None, :, None, None]
        moved = jnp.squeeze(jnp.take_along_axis(moves.boards, sel, axis=0),
                            axis=0)
        mono_a = heuristics.monotonicity(moved)
        empt_a = heuristics.emptiness(moved)

        done = res.done
        # Terminal-step potential zeroing (train.py:318-322).
        mono_a = jnp.where(done, 0, mono_a)
        empt_a = jnp.where(done, 0, empt_a)

        ep_points_new = ep_points + res.reward
        ep_moves_new = ep_moves + 1
        tiles = engine.max_tile_value(res.board)

        rec = dict(
            board_before=boards.astype(jnp.int8),
            board_after=res.board.astype(jnp.int8),
            action=action.astype(jnp.int8),
            target_action=action.astype(jnp.int8),
            target_probs=jax.nn.one_hot(action, 4, dtype=jnp.float32),
            logprobs=logprobs,
            action_mask=invalid,
            value_pred=value[..., 0],
            entropy=entropy,
            points=res.reward,
            preview=moves.preview_rewards,
            max_created=res.max_created.astype(jnp.int8),
            mono_before=mono_b,
            mono_after=mono_a,
            empt_before=empt_b,
            empt_after=empt_a,
            valid=jnp.ones((N,), jnp.bool_),
            done_here=done,
            ep_start=ep_moves_new == 1,
            ep_score=jnp.where(done, ep_points_new, 0),
            ep_len=jnp.where(done, ep_moves_new, 0),
            ep_tile=jnp.where(done, tiles, 0),
        )

        fresh = engine.reset(k_reset, (N,))
        c = dict(
            boards=jnp.where(done[:, None, None], fresh, res.board),
            env_key=env_key,
            ep_points=jnp.where(done, 0, ep_points_new),
            ep_moves=jnp.where(done, 0, ep_moves_new),
        )
        if recorder is not None:
            from . import capture

            c["recorder"] = capture.record_step(
                rec_in, ep_moves=ep_moves,
                board_before=boards, board_after=res.board,
                action=action, points=res.reward, entropy=entropy,
                done=done, ep_points_new=ep_points_new,
                ep_moves_new=ep_moves_new,
            )
        return c, rec

    c0 = dict(carry._asdict())
    if recorder is not None:
        c0["recorder"] = recorder

    keys = jax.random.split(key, num_steps)
    c_out, recs = jax.lax.scan(body, c0, keys)

    # Chunk-boundary bootstrap: the critic's value of the carry-out state, in
    # its own (normalized) units — denormalized by the advantage stage. For
    # lanes whose last step was terminal this is V(fresh board); the backward
    # scan zeroes the bootstrap at done steps, so it is never used there.
    _, boot = apply_fn(params, encode_boards(c_out["boards"]))

    traj = PackedTrajectory(
        **recs,
        boot_value=boot[..., 0],
        steps_executed=jnp.int32(num_steps),
    )
    rec_out = c_out.pop("recorder", None)
    if recorder is not None:
        return traj, EnvCarry(**c_out), rec_out
    return traj, EnvCarry(**c_out)
