"""utils/profiling: phase timers, trace annotation, memory stats
(reference observability surface, SURVEY §5.1)."""

import glob
import os

import jax
import jax.numpy as jnp

from gantrack_tpu.utils.profiling import (
    PhaseTimer, capture_trace, device_memory_stats, trace_annotation,
)


def test_phase_timer_accumulates_and_resets():
    t = PhaseTimer()
    t.start("a")
    x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    dt1 = t.stop("a", result=x)
    t.start("a")
    dt2 = t.stop("a")
    assert dt1 > 0 and dt2 >= 0
    assert abs(t.times["a"] - (dt1 + dt2)) < 1e-9
    out = t.reset()
    assert out["a"] == dt1 + dt2 and t.times == {}


def test_trace_annotation_wraps_compute():
    with trace_annotation("unit-test-region"):
        y = float(jnp.sum(jnp.arange(8)))
    assert y == 28.0


def test_capture_trace_writes_xplane(tmp_path):
    with capture_trace(str(tmp_path)):
        float(jnp.sum(jnp.ones((32, 32)) @ jnp.ones((32, 32))))
    files = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert files, f"no xplane written under {tmp_path}"
    assert os.path.getsize(files[0]) > 0


def test_device_memory_stats_shape():
    stats = device_memory_stats(jax.devices()[0])
    assert isinstance(stats, dict)
    for v in stats.values():
        assert v >= 0.0
