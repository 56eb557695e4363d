"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md §5: only progress prints).
Throughput is this framework's north-star metric, so it ships:

- ``Timer`` / ``timed``: wall-clock spans; set ``.result`` on the yielded
  holder to force-complete a device value before the clock stops (NOTE: on
  the tunneled TPU platform ``block_until_ready`` returns before execution
  completes, so honest timing fetches a scalar).
- ``throughput``: windows/sec accounting helper.
- ``trace``: context manager around ``jax.profiler.trace`` writing a TensorBoard
  -loadable trace directory (set ``SHM_TPU_TRACE_DIR`` or pass a path).
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import numpy as np


def sync(x) -> None:
    """Force completion of a device value (host readback of one element)."""
    arr = jax.tree.leaves(x)
    if arr:
        np.asarray(jax.device_get(arr[0]))


@dataclass
class Timer:
    """Accumulating wall-clock timer with named spans."""

    spans: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str):
        """``with t.span("gate") as s: s.result = fn(x)`` — ``s.result`` is
        force-completed (host readback) before the clock stops, so device
        work launched INSIDE the block is included in the span. (A value
        passed at context entry could not do this: it would already exist
        before the block ran, and the async work dispatched inside would
        still be in flight when the span closed.)"""
        h = _SyncHolder()
        t0 = time.perf_counter()
        try:
            yield h
        finally:
            if h.result is not None:
                sync(h.result)
            dt = time.perf_counter() - t0
            self.spans[name] = self.spans.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"seconds": v, "calls": self.counts[k],
                    "mean_ms": 1e3 * v / max(self.counts[k], 1)}
                for k, v in self.spans.items()}


class _SyncHolder:
    """Set ``.result`` inside a ``span``/``timed`` block to have it synced
    (one-element host readback) before the elapsed time is recorded."""

    result = None


@contextlib.contextmanager
def timed(name: str = ""):
    """print-style one-shot timer: ``with timed("gate") as t: t.result = fn(x)``
    — ``t.result`` is force-completed before the elapsed time prints (see
    :meth:`Timer.span` for why the value must be produced inside the block)."""
    h = _SyncHolder()
    t0 = time.perf_counter()
    try:
        yield h
    finally:
        if h.result is not None:
            sync(h.result)
        dt = time.perf_counter() - t0
        print(f"[time] {name}: {dt * 1e3:.1f} ms")


def throughput(n_items: int, seconds: float, unit: str = "windows") -> Dict[str, float]:
    return {"n": n_items, "seconds": seconds,
            f"{unit}_per_sec": n_items / seconds if seconds > 0 else float("inf")}


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None):
    """jax.profiler trace span; no-op when no directory is configured."""
    trace_dir = trace_dir or os.environ.get("SHM_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


__all__ = ["Timer", "timed", "throughput", "trace", "sync"]
