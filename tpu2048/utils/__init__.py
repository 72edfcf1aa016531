"""Observability: metric logger, batch stats, pretty printers, exporters."""

from . import printing, stats, viz_export  # noqa: F401
from .logger import MetricLogger  # noqa: F401
