"""Tracing and per-stage timing.

The reference has no profiling at all (SURVEY §5: only ad-hoc prints and
tqdm bars). Here every public tool can be timed with the ``stage`` context
manager (enabled via ``mu.set_options(profile=True)`` or
``MUON_TPU_PROFILE=1``), and full device traces go through ``trace`` —
a thin wrapper over ``jax.profiler.trace`` whose output loads in
TensorBoard/XProf for kernel-level inspection on TPU.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager
from typing import Dict, List, Optional

__all__ = ["stage", "trace", "get_timings", "reset_timings", "logger"]

logger = logging.getLogger("muon_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

_TIMINGS: Dict[str, List[float]] = {}


def _enabled() -> bool:
    if os.environ.get("MUON_TPU_PROFILE"):
        return True
    try:
        from .._core.config import OPTIONS

        return bool(OPTIONS.get("profile", False))
    except Exception:
        return False


@contextmanager
def stage(name: str, force: bool = False, flush: Optional[bool] = None):
    """Time a pipeline stage.

    Device work is flushed before stopping the clock so async dispatch
    doesn't hide in the next stage — but ONLY on the main thread by
    default: a host-only stage timed from a worker thread (e.g. leiden
    overlapped with the UMAP SGD) must not wait behind another thread's
    queued device programs. A worker-thread stage that DOES time device
    work must pass ``flush=True`` explicitly, or its queued programs go
    unreported (ADVICE r4). ``flush=False`` skips the drain everywhere
    (used by callers that flush once per run instead of per stage)."""
    if not (force or _enabled()):
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        try:
            import threading

            if flush is None:
                flush = (
                    threading.current_thread() is threading.main_thread()
                )
            if flush:
                import jax
                import jax.numpy as jnp

                # devices execute queued programs in order, so forcing a
                # fresh scalar to host drains the queue — block_until_ready
                # does NOT reliably block through tunneled/remote devices
                # (CLAUDE.md). Only the MAIN thread flushes: a host-only
                # stage timed from a worker thread (e.g. leiden overlapped
                # with the UMAP SGD) must not wait behind another thread's
                # queued device programs.
                float(jnp.zeros(()).sum())
        except Exception:
            pass
        dt = time.perf_counter() - t0
        _TIMINGS.setdefault(name, []).append(dt)
        logger.info(f"[stage] {name}: {dt:.3f}s")


@contextmanager
def trace(logdir: str, name: Optional[str] = None):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    with jax.profiler.trace(logdir):
        if name:
            with jax.profiler.TraceAnnotation(name):
                yield
        else:
            yield


def get_timings() -> Dict[str, List[float]]:
    return dict(_TIMINGS)


def reset_timings() -> None:
    _TIMINGS.clear()
