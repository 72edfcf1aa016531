"""Optimizers (Muon, AdamW), LR schedules and TPU kernels."""

from . import adamw, muon, optimizer, pallas_merge, schedules  # noqa: F401
from .optimizer import OptimizerConfig, OptState  # noqa: F401
from .schedules import cosine_with_warmup  # noqa: F401
