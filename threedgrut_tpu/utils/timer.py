"""Device timing utilities (threedgrut/utils/timer.py equivalents).

CUDA events become block_until_ready wall timing; nvtx ranges become
``jax.named_scope`` / ``jax.profiler.TraceAnnotation`` so phases show up
in XLA profiler timelines. ``ScopedTimer`` keeps the reference's global
``timing_options`` toggle surface.
"""

from __future__ import annotations

import dataclasses
import time
from contextlib import contextmanager
from typing import Dict, Optional

import jax


@dataclasses.dataclass
class TimingOptions:
    """Global toggle (threedgrut/utils/timer.py:30-168)."""
    active: bool = False
    print_enabled: bool = False


timing_options = TimingOptions()


class DeviceTimer:
    """CudaTimer equivalent: wall time around device work with an explicit
    sync (timer.py:171-196). Accumulates like the reference (start/end
    pairs, .timing() returns ms)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._start: Optional[float] = None
        self._total_ms = 0.0
        self._count = 0

    def start(self):
        if self.enabled:
            self._start = time.perf_counter()

    def end(self, result=None):
        if not self.enabled or self._start is None:
            return result
        if result is not None:
            jax.block_until_ready(result)
        self._total_ms += (time.perf_counter() - self._start) * 1000.0
        self._count += 1
        self._start = None
        return result

    def timing(self) -> float:
        return self._total_ms / max(self._count, 1)

    def reset(self):
        self._total_ms = 0.0
        self._count = 0


@contextmanager
def ScopedTimer(name: str, results: Optional[Dict[str, float]] = None):
    """Scoped wall timer honoring the global timing_options toggle."""
    if not timing_options.active:
        yield
        return
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    dt = (time.perf_counter() - t0) * 1000.0
    if results is not None:
        results[name] = results.get(name, 0.0) + dt
    if timing_options.print_enabled:
        print(f"[timer] {name}: {dt:.2f} ms")


@contextmanager
def trace_annotation(name: str):
    """nvtx.range equivalent: annotate the XLA profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler_trace(log_dir: str):
    """Start an XLA profiler capture (view in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    jax.profiler.stop_trace()
