"""Tracing / profiling utilities.

Capability parity with the reference's observability (SURVEY §5.1):
``record_function`` phase annotations → ``jax.profiler.TraceAnnotation``;
CUDA-event phase timing → host wall timers around blocked steps;
``torch.cuda.max_memory_allocated`` → device memory stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Annotate a region in the XLA profiler timeline (replacement for
    the reference's ``torch.autograd.profiler.record_function``)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase timing with block-until-ready semantics
    (replacement for paired CUDA events,
    ``training_loop_mi_multimodal.py:256-261``)."""

    def __init__(self):
        self._starts: Dict[str, float] = {}
        self.times: Dict[str, float] = {}

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._starts.pop(name)
        self.times[name] = self.times.get(name, 0.0) + dt
        return dt

    def reset(self) -> Dict[str, float]:
        out = dict(self.times)
        self.times.clear()
        return out


def device_memory_stats(device=None) -> Dict[str, float]:
    """Peak/current device memory (replacement for
    ``torch.cuda.max_memory_allocated``, ``training_loop:392-395``)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    if not stats:  # some runtimes (axon tunnel) return None
        return {}
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key.replace("bytes", "gb")] = stats[key] / 2**30
    return out
