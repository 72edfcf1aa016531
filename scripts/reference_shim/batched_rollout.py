"""The module the reference imports but does not ship (train.py:30).

Behavior inferred from call sites (train.py:1676-1679, 2034):
play N games via the reference's own single-game rollout.
"""


def play_games_batched(model, num_games=1, max_steps=100000, device="cpu"):
    import train as _t

    return [
        _t.play_game_for_episode(model, max_steps=max_steps, device=device)
        for _ in range(num_games)
    ]
