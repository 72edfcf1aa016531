"""Interactive terminal clients: human play and agent-watching
(reference ``human``/``play`` commands, train.py:2075-2297).

These run the game host-side through the Python oracle (no accelerator needed
for a single interactive board) and call the JAX model for the agent."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from ..env import oracle

DIR_NAMES = ["UP", "DOWN", "LEFT", "RIGHT"]


def _format_grid(grid, indent=""):
    from ..utils.printing import format_grid

    return format_grid(grid, indent)


def _display(grid):
    print()
    print(_format_grid(grid))
    print(f"Score: {oracle.grid_score(grid)}")


def _get_keypress():
    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setraw(fd)
        ch = sys.stdin.read(1)
        if ch == "\x1b":
            ch += sys.stdin.read(2)
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
    return ch


KEYMAP = {
    "w": oracle.UP, "s": oracle.DOWN, "a": oracle.LEFT, "d": oracle.RIGHT,
    "\x1b[A": oracle.UP, "\x1b[B": oracle.DOWN,
    "\x1b[C": oracle.RIGHT, "\x1b[D": oracle.LEFT,
}


def human_play() -> None:
    os.system("clear" if os.name == "posix" else "cls")
    print("🎮 2048 - Human Player Mode")
    print("Controls: W/↑=Up, S/↓=Down, A/←=Left, D/→=Right, Q=Quit")
    print("-" * 40)

    grid = oracle.reset()
    moves = 0
    _display(grid)

    while oracle.has_next_step(grid):
        print("\nYour move: ", end="", flush=True)
        key = _get_keypress()
        if key.lower() == "q":
            print("\n\n👋 Thanks for playing!")
            break
        d = KEYMAP.get(key.lower() if len(key) == 1 else key)
        if d is None:
            print("Invalid key. Use WASD or arrow keys.")
            continue
        if not oracle.direction_is_legal(grid, d):
            print(f"Can't move {DIR_NAMES[d].lower()}! Try another direction.")
            continue
        grid, points, done, _ = oracle.step(grid, d)
        moves += 1
        os.system("clear" if os.name == "posix" else "cls")
        print("🎮 2048 - Human Player Mode")
        print("Controls: W/↑=Up, S/↓=Down, A/←=Left, D/→=Right, Q=Quit")
        print("-" * 40)
        print(f"Move {moves}: {DIR_NAMES[d]} (+{points} points)")
        _display(grid)
        if done:
            break

    print("\n" + "=" * 40)
    print("🎮 GAME OVER!")
    print(f"Final Score: {oracle.grid_score(grid)}")
    print(f"Total Moves: {moves}")
    max_tile = max(2**c if c > 0 else 0 for row in grid for c in row)
    print(f"Highest Tile: {max_tile}")
    if max_tile >= 2048:
        print("🎉 Congratulations! You reached 2048!")
    print("=" * 40)


def watch_agent(model_path=None, delay: float = 0.5, seed: int = 0,
                search: int = 0) -> None:
    """Watch an agent play one game, with per-move best-available comparison
    and an EMA step-reward tracker (reference play command, train.py:2184-2297).
    Unlike the reference (which refuses model loading), --model works here.
    ``search`` > 0 selects moves by expectimax of that depth instead of
    sampling the policy (requires --model with a train-state checkpoint for
    calibrated coefficients; params-only falls back to pure EV)."""
    import jax
    import jax.numpy as jnp
    from ..models import MLPConfig, mlp
    from ..models.encoding import encode_boards

    if model_path:
        from .evaluate import load_model_checkpoint, _apply_fn

        print(f"Loading model from: {model_path}")
        params, mc, mt = load_model_checkpoint(model_path)
        apply_eval = _apply_fn(mc, mt)
    else:
        print("Playing with random agent (no model specified)")
        mc = MLPConfig(hidden_dim=64)
        params = mlp.init(jax.random.key(seed), mc, zero_heads=False)
        apply_eval = lambda p, x: mlp.apply(p, mc, x)

    forward = jax.jit(apply_eval)
    search_fn = None
    if search:
        from ..algo import search as SRCH

        coefs = SRCH.SearchCoefs()
        if model_path:
            from .evaluate import load_search_coefs

            coefs = load_search_coefs(model_path)
        depth = max(1, min(int(search), 2))
        print(f"Expectimax move selection (depth={depth}, coefs={coefs})")
        search_fn = jax.jit(lambda p, b: SRCH.expectimax_scores(
            apply_eval, p, b, None, coefs, depth))
    rng = np.random.default_rng(seed)
    grid = oracle.reset()

    print("\nStarting game...")
    _display(grid)

    moves = 0
    total_points = 0
    total_reward, momentum, step = 0.0, 0.90, 1

    while oracle.has_next_step(grid):
        previews = oracle.preview_move_rewards(grid)
        best_dir = int(np.argmax(previews))
        best_points = previews[best_dir]

        enc = encode_boards(jnp.asarray(grid, dtype=jnp.int32)[None])
        logits, _ = forward(params, enc)
        logits = np.asarray(logits)[0]
        legal = oracle.legal_directions(grid)
        if search_fn is not None:
            scores = np.asarray(
                search_fn(params, jnp.asarray(grid, jnp.int32)[None]))[0]
            action = int(np.argmax(scores))
        else:
            masked = np.where([d in legal for d in range(4)], logits, -np.inf)
            probs = np.exp(masked - masked.max())
            probs /= probs.sum()
            action = int(rng.choice(4, p=probs))

        grid, points, done, _ = oracle.step(grid, action)
        moves += 1
        total_points += points

        step_reward = (1.0 if action == best_dir else points / best_points) if best_points else 0
        total_reward = total_reward * momentum + step_reward * (1 - momentum)
        corrected = total_reward / (1 - momentum**step)

        print(f"\nMove {moves}: {DIR_NAMES[action]} (points earned: {points})")
        print(f"Best available: {DIR_NAMES[best_dir]} ({best_points} points)")
        print(f"Step reward: {step_reward:.3f} | Total reward (EMA): "
              f"{total_reward:.3f} | Bias Corrected: {corrected:.3f}")
        _display(grid)
        step += 1
        if done:
            print("\n🎮 Game Over!")
            break
        time.sleep(delay)

    print(f"\n{'=' * 25}")
    print(f"Final Score: {oracle.grid_score(grid)}")
    print(f"Total Moves: {moves}")
    print(f"Total Reward: {total_points}")
    print(f"{'=' * 25}\n")
