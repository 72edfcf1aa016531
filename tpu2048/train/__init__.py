"""Orchestration: CLI, training loop, checkpoint/resume, eval, export."""

from . import checkpoint, cli, loop  # noqa: F401
from .loop import TrainConfig, train  # noqa: F401
