"""Profiling/tracing hooks — the TPU-native observability layer.

The reference has no profiler integration (SURVEY.md §5.1: nvitop declared,
never imported). Here: jax.profiler trace capture around training windows,
named step/phase annotations that show up in the trace viewer, and a
lightweight per-step wall-clock tracker with a trustworthy completion
barrier (a host scalar fetch — block_until_ready is not reliable through
remote TPU relays).
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    try:
        jax.profiler.start_trace(logdir)
        started = True
        logging.info(f"jax.profiler trace -> {logdir}")
    except Exception as e:  # relay backends may not support profiling
        logging.warning(f"profiler unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the trace viewer (usable as decorator or context)."""
    return jax.profiler.TraceAnnotation(name)


def force_completion(x) -> float:
    """Trustworthy device-completion barrier: fetch a scalar derived from x."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


class StepTimer:
    """Steady-state step timing with warmup exclusion."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            force_completion(result)
        dt = time.perf_counter() - self._last
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean_ms(self) -> float:
        return float(np.mean(self.times) * 1e3) if self.times else float("nan")

    def throughput(self, items_per_step: int) -> float:
        if not self.times:
            return float("nan")
        return items_per_step / float(np.mean(self.times))
