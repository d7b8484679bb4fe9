"""Fused bias + activation + gain + clamp.

Capability parity with the reference ``torch_utils/ops/bias_act.py``
(activation table at ``bias_act.py:21-31``, op semantics ``:52-120``).
On TPU no hand-written kernel is needed: the op is a closed-form jnp
expression that XLA fuses into the producing matmul/conv, and JAX
autodiff provides arbitrary-order gradients (the reference needed a
dedicated CUDA path for 2nd-order grads).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ActivationSpec:
    fn: callable
    def_alpha: float
    def_gain: float


# Same set of 9 activations and default gains as the reference table.
activation_funcs = {
    "linear": ActivationSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": ActivationSpec(lambda x, alpha: jax.nn.relu(x), 0.0, float(np.sqrt(2))),
    "lrelu": ActivationSpec(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, float(np.sqrt(2))),
    "tanh": ActivationSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActivationSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActivationSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActivationSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, float(np.sqrt(2))),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """``clamp(act(x + b) * gain, ±clamp)`` with per-activation defaults.

    Args:
        x: input of any shape.
        b: 1-D bias matching ``x.shape[dim]``, or None.
        dim: axis of ``x`` the bias applies to.  Default -1 — this
            framework is NHWC, so the channel axis is last (the reference
            defaults to 1 for NCHW).
        act: one of :data:`activation_funcs`.
        alpha: activation shape parameter (lrelu slope); None → default.
        gain: output scale; None → the activation's ``def_gain``.
        clamp: clamp output to ``[-clamp, clamp]``; None → no clamping.
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1, "bias must be 1-D"
        axis = dim % x.ndim
        assert b.shape[0] == x.shape[axis], (
            f"bias dim {b.shape[0]} != x.shape[{axis}] {x.shape[axis]}"
        )
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.fn(x, alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        clamp = float(clamp)  # numpy scalars are strong-typed and would promote bf16
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
