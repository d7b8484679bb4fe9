"""Compute-precision pin for the model stacks.

The reference hard-codes ``torch.float32`` wherever it needs full
precision (``networks_stylegan2.py``: mapping, style affines, mbstd
statistics, torgb accumulation).  Here that "high" dtype is a process
pin: :func:`high` returns ``float32`` in production — bit-identical to
a literal pin — but can be raised to ``float64`` for the mesh-size
invariance check (``scripts/invariance_f64.py --real-models``), where
fp32 reassociation noise (~1e-7) would mask a subtly-wrong small-term
reduction that f64 (~1e-16) cannot.

The pin is read at *trace* time.  Because raising it also raises every
input/param dtype, jit caches never alias across settings (avals
differ); still, :func:`pinned_float64` is meant for dedicated processes
(tests / the invariance script), not mid-training toggling.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp

_HIGH = [jnp.float32]


def high():
    """The current full-precision dtype (float32 unless pinned)."""
    return _HIGH[-1]


@contextlib.contextmanager
def pinned_float64():
    """Raise the model stacks' full-precision dtype to float64.

    Requires ``jax.config.jax_enable_x64`` (else float64 silently decays
    to float32 and the pin checks nothing — callers assert).
    """
    import jax

    assert jax.config.jax_enable_x64, "pinned_float64 requires JAX_ENABLE_X64"
    _HIGH.append(jnp.float64)
    try:
        yield
    finally:
        _HIGH.pop()
