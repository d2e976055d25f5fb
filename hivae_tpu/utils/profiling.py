"""Profiling / tracing hooks (SURVEY §5.1 — the reference has none).

Thin wrappers over ``jax.profiler``: step-scoped trace annotations, a
context manager that captures a trace directory viewable in TensorBoard /
Perfetto, and a simple wall-clock step timer with EMA.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (use around host-side phases)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA wall-clock step timer with tokens/frames-per-second helpers."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else \
            self.ema * self.avg + (1 - self.ema) * dt
        return dt

    def stats(self, items_per_step: float = 1.0) -> Dict[str, float]:
        if self.avg is None:
            return {}
        return {"step_time_s": self.avg,
                "items_per_sec": items_per_step / self.avg}


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GiB (best-effort)."""
    out = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            s = d.memory_stats()
            out[f"device{i}_bytes_in_use_gib"] = s["bytes_in_use"] / 2 ** 30
            out[f"device{i}_peak_gib"] = s.get("peak_bytes_in_use", 0) / 2 ** 30
        except Exception:
            pass
    return out
