"""Exact space-to-depth rewrite of 3×3/stride-1 convolutions.

High-resolution low-channel conv layers (e.g. 256²×64ch at cbase 16384)
run at ~6% of the v5e MXU peak because the channel (lane) dimension is
half-empty.  Working in a 2×2-block space-to-depth layout quadruples the
channel count at a 2× FLOP overhead — a net ~2× for lane-bound layers
(profiled in docs/ROADMAP.md).

This module provides the exact kernel transform: a 3×3 conv on ``x``
equals a 3×3 conv on ``s2d(x)`` with the rearranged (half-sparse) kernel
from :func:`s2d_kernel`, producing ``s2d(y)``.  Integration into the
model layers (keeping modulation/FIR semantics) is the round-2 task; the
transform itself is verified by ``tests/test_space_to_depth.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["space_to_depth", "depth_to_space", "s2d_kernel", "conv3x3_s2d"]


def space_to_depth(x: jax.Array, block: int = 2) -> jax.Array:
    """[N,H,W,C] -> [N,H/b,W/b,b·b·C]; channel index = (dy·b + dx)·C + c."""
    n, h, w, c = x.shape
    b = block
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # [N, H/b, W/b, dy, dx, C]
    return x.reshape(n, h // b, w // b, b * b * c)


def depth_to_space(x: jax.Array, block: int = 2) -> jax.Array:
    n, hb, wb, cc = x.shape
    b = block
    c = cc // (b * b)
    x = x.reshape(n, hb, wb, b, b, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, hb * b, wb * b, c)


def s2d_kernel(w: jax.Array) -> jax.Array:
    """[3,3,C,C'] -> [3,3,4C,4C'] such that
    ``conv(s2d(x), s2d_kernel(w), SAME) == s2d(conv(x, w, SAME))``.

    Tap placement: source row ``2(A-1)+dy - py`` must hit the original
    kernel offset ``u ∈ {-1,0,1}`` (same for columns); all other taps are
    structurally zero.
    """
    k, k2, c, cp = w.shape
    assert k == 3 and k2 == 3
    out = jnp.zeros((3, 3, 4 * c, 4 * cp), w.dtype)
    for a in range(3):           # block-space kernel row
        for bb in range(3):      # block-space kernel col
            for dy in range(2):  # input sub-pixel
                for dx in range(2):
                    for py in range(2):  # output sub-pixel
                        for px in range(2):
                            u = 2 * (a - 1) + dy - py
                            v = 2 * (bb - 1) + dx - px
                            if -1 <= u <= 1 and -1 <= v <= 1:
                                ci = (dy * 2 + dx) * c
                                co = (py * 2 + px) * cp
                                out = out.at[a, bb, ci : ci + c, co : co + cp].set(
                                    w[u + 1, v + 1]
                                )
    return out


def conv3x3_s2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME 3×3 conv computed in space-to-depth layout (exact)."""
    xs = space_to_depth(x)
    ws = s2d_kernel(w)
    ys = jax.lax.conv_general_dilated(
        xs, ws.astype(xs.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return depth_to_space(ys)
