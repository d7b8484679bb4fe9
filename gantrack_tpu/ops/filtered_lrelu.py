"""Filtered leaky ReLU — the StyleGAN3 anti-aliased nonlinearity.

Capability parity with the reference ``torch_utils/ops/filtered_lrelu.py:56-155``
(the 1.7k-LoC CUDA mega-kernel's semantics): bias → ×up zero-insert
upsample → pad → FIR ``fu`` (gain ``up**2``) → gain·leaky-ReLU → clamp →
FIR ``fd`` → ÷down.

On TPU this composes :func:`upfirdn2d` (each pass a single fused XLA
conv) with the elementwise stage, which XLA fuses between them; the
packed-sign-tensor backward trick of the CUDA kernel is a memory
optimisation JAX's rematerialisation (``jax.checkpoint``) subsumes.
A Pallas fusion of the up-filter/lrelu/down-filter chain is a potential
future optimisation for the StyleGAN3 path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bias_act import bias_act
from .upfirdn2d import _get_filter_size, _parse_padding, upfirdn2d

__all__ = ["filtered_lrelu"]


def filtered_lrelu(
    x: jax.Array,
    fu: Optional[jax.Array] = None,
    fd: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = float(np.sqrt(2)),
    slope: float = 0.2,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Apply the filtered leaky ReLU to NHWC images.

    Args:
        x: ``[N, H, W, C]``.
        fu / fd: upsampling / downsampling FIR filters (see
            :func:`setup_filter`), or None for identity.
        b: optional ``[C]`` bias.
        padding: w.r.t. the upsampled image; negative crops.
    """
    assert x.ndim == 4
    fu_w, fu_h = _get_filter_size(fu)
    fd_w, fd_h = _get_filter_size(fd)
    px0, px1, py0, py1 = _parse_padding(padding)
    assert up >= 1 and down >= 1
    assert slope >= 0

    in_h, in_w = x.shape[1], x.shape[2]
    out_w = (in_w * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    out_h = (in_h * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down

    x = bias_act(x, b, dim=-1)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1], gain=up**2)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down)

    assert x.shape[1] == out_h and x.shape[2] == out_w, (x.shape, out_h, out_w)
    return x
