"""Cross-cutting utilities: metrics/logging, checkpoints."""

from .checkpoint import Checkpoint, run_digest
from .metrics import METRICS, configure_logging, enable_profiling, log

__all__ = [
    "Checkpoint",
    "METRICS",
    "configure_logging",
    "enable_profiling",
    "log",
    "run_digest",
]
