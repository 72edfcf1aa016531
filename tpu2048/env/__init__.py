"""Vectorized pure-functional 2048 environment (engine, heuristics, symmetry,
plus a Python oracle for parity testing)."""

from .engine import (  # noqa: F401
    GRID_SIZE,
    NUM_ACTIONS,
    NUM_CELLS,
    MoveSet,
    StepResult,
    all_moves,
    board_scores,
    max_tile_value,
    merge_lines_left,
    reset,
    spawn_tile,
    step,
)
from . import heuristics, oracle, symmetry  # noqa: F401
