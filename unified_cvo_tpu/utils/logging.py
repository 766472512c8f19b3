"""Structured observability: jsonl metrics + phase timers + profiler hook.

Replaces the reference's per-iteration text-file dumps (ell_history.txt,
transformation_history.txt, nonzeros.txt ... CvoGPU.cu:1350-1361,
IRLS.cpp:83-84) with structured jsonl rows, and the CUDA-event timing
brackets (CvoGPU.cu:1368-1371) with block_until_ready phase timers +
optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional


class MetricsLogger:
    """Append-only jsonl metrics stream."""

    def __init__(self, path: Optional[str]):
        self._f = open(path, "a") if path else None

    def log(self, **row):
        if self._f is None:
            return
        row.setdefault("t", time.time())
        self._f.write(json.dumps(row, default=float) + "\n")
        self._f.flush()

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


@contextlib.contextmanager
def phase_timer(name: str, logger: Optional[MetricsLogger] = None, sync=None):
    """Wall-clock bracket; `sync` is typically jax.block_until_ready on the
    phase's outputs (pass a callable)."""
    t0 = time.time()
    yield
    if sync is not None:
        sync()
    dt = time.time() - t0
    if logger:
        logger.log(phase=name, seconds=dt)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """jax_debug_nans context — the functional-purity replacement for the
    reference's (absent) sanitizers (SURVEY.md §5: JAX removes the CUDA
    benign-race class by construction; NaN propagation is the remaining
    failure mode, surfaced eagerly here)."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
