"""Startup module summaries.

Capability parity with the reference ``torch_utils/misc.py:196-264``
(``print_module_summary``): a per-submodule table of parameter counts and
output shapes printed once at training startup.  Flax-native via
``nn.tabulate`` (abstract eval — no device compute).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def module_summary(module, *args, rngs=None, depth: int = 2, **kwargs) -> str:
    import flax.linen as nn

    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    try:
        return nn.tabulate(
            module, rngs, depth=depth,
            console_kwargs={"width": 120, "force_terminal": False},
        )(*args, **kwargs)
    except Exception as e:  # summaries must never block training
        return f"[module summary unavailable: {type(e).__name__}: {e}]"


def print_module_summary(module, *args, rngs=None, depth: int = 2, **kwargs) -> None:
    print(module_summary(module, *args, rngs=rngs, depth=depth, **kwargs))
