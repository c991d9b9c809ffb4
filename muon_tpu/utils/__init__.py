"""Utilities: the cross-modality key grammar (reference muon/_core/utils.py)
plus profiling/tracing (SURVEY §5 auxiliary subsystems)."""

from .._core.utils import _get_values, get_values
from .profiling import stage, trace, get_timings, reset_timings, logger

__all__ = [
    "get_values",
    "stage",
    "trace",
    "get_timings",
    "reset_timings",
    "logger",
]
