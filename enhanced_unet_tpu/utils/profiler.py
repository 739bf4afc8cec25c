"""Tracing / profiling: step timers + jax.profiler integration.

The reference has no profiler (SURVEY §5 — tqdm bars only).  This module
provides:
- StepTimer: wall-clock step timing with warmup skip and images/sec, the
  source of BASELINE.md throughput numbers;
- trace_context: a context manager around jax.profiler.trace for capturing
  XLA traces viewable in TensorBoard/XProf;
- enable_debug: turns on jax debug_nans/disable_jit style knobs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StepTimer:
    """Accumulates step wall times; skips `warmup` steps (compile noise)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0, "mean_sec": 0.0, "items_per_sec": 0.0}
        mean = sum(self._times) / len(self._times)
        return {
            "steps": len(self._times),
            "mean_sec": mean,
            "p50_sec": sorted(self._times)[len(self._times) // 2],
            "items_per_sec": items_per_step / mean if mean > 0 else 0.0,
        }


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """Capture a jax.profiler trace into log_dir when set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug(nans: bool = True, disable_jit: bool = False) -> None:
    """Debug-mode toggles (SURVEY §5 race-detection analogue: JAX's own
    numerical checks)."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
