"""Cross-device scalar statistics — training_stats equivalent.

Capability parity with the reference ``torch_utils/training_stats.py``:
``report()`` accumulates per-name moments ``[num, sum, sum_sq]``
(``training_stats.py:79-99``), a collector reduces them across replicas
and exposes mean/std (``:188-210, 234-266``).

TPU-native design: moments are a ``{name: f32[3]}`` dict built *inside*
the jitted step and ``psum``-reduced over the mesh along with everything
else — no separate collective round-trips.  The host-side
:class:`Collector` accumulates returned moment dicts between ticks and
renders the ``stats.jsonl`` records (reference
``training_loop_mi_multimodal.py:466-469``).
"""

from __future__ import annotations

import json
import time
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

Moments = Dict[str, jax.Array]  # name -> f32[3] = [n, sum, sum_sq]


def report(moments: Moments, name: str, value: jax.Array) -> Moments:
    """Record a tensor's moments under ``name`` (inside jit).

    Values are flattened; counts/sums accumulate if the name repeats.
    """
    v = jnp.asarray(value, jnp.float32).reshape(-1)
    m = jnp.stack([jnp.asarray(v.size, jnp.float32), jnp.sum(v), jnp.sum(jnp.square(v))])
    if name in moments:
        m = moments[name] + m
    out = dict(moments)
    out[name] = m
    return out


def merge(*moment_dicts: Moments) -> Moments:
    out: Dict[str, jax.Array] = {}
    for d in moment_dicts:
        for k, v in d.items():
            out[k] = out[k] + v if k in out else v
    return out


def psum_moments(moments: Moments, axis_name: str) -> Moments:
    return {k: jax.lax.psum(v, axis_name) for k, v in moments.items()}


class Collector:
    """Host-side accumulator over per-step moment dicts.

    ``mean(name)`` / ``std(name)`` follow the reference estimators
    (``training_stats.py:188-210``).
    """

    def __init__(self):
        self._moments: Dict[str, np.ndarray] = {}

    def update(self, moments: Mapping[str, jax.Array | np.ndarray]) -> None:
        for k, v in moments.items():
            v = np.asarray(v, np.float64)
            self._moments[k] = self._moments.get(k, np.zeros(3)) + v

    def names(self):
        return list(self._moments)

    def num(self, name: str) -> float:
        return float(self._moments.get(name, np.zeros(3))[0])

    def mean(self, name: str, default: float = 0.0) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return default
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0 or not np.isfinite(m[1] / m[0]):
            return 0.0
        if m[0] == 1:
            return 0.0
        mean = m[1] / m[0]
        raw_var = m[2] / m[0]
        return float(np.sqrt(max(raw_var - mean**2, 0)))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"num": self.num(name), "mean": self.mean(name), "std": self.std(name)}
            for name in self._moments
        }

    def clear(self) -> None:
        self._moments.clear()


class JsonlLogger:
    """Append-only jsonl writer for stats records (stats.jsonl parity)."""

    def __init__(self, path: str):
        self._f = open(path, "at", buffering=1)

    def write(self, record: Mapping, timestamp: Optional[float] = None) -> None:
        rec = dict(record)
        rec["timestamp"] = timestamp if timestamp is not None else time.time()
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()
