"""Differentiable bilinear grid sampling (zeros padding, align_corners=False).

Capability parity with the reference ``torch_utils/ops/grid_sample_gradfix.py:28-86``,
which wraps ``torch.nn.functional.grid_sample(bilinear, zeros, align_corners=False)``
to make it twice-differentiable (needed because ADA-augmented images flow
into the R1 double-backward).  In JAX the gather-based formulation below is
arbitrarily differentiable out of the box, so no gradfix is required.

Layout: input NHWC; grid ``[N, H_out, W_out, 2]`` with ``grid[..., 0]`` the
normalised x coordinate and ``grid[..., 1]`` the y coordinate, both in
[-1, 1] mapped to pixel centres via ``((g + 1) * size - 1) / 2``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grid_sample"]


def grid_sample(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample ``x`` at ``grid`` locations with bilinear interpolation.

    Out-of-bounds taps contribute zero (torch ``padding_mode='zeros'``).

    Args:
        x: ``[N, H, W, C]`` input images.
        grid: ``[N, H_out, W_out, 2]`` normalised (x, y) sample locations.

    Returns:
        ``[N, H_out, W_out, C]``.
    """
    assert x.ndim == 4 and grid.ndim == 4 and grid.shape[-1] == 2
    n, h, w, c = x.shape
    compute_dtype = x.dtype

    # Coordinate math pinned to f32 (bf16 coordinates shift samples by whole
    # pixels), widened to f64 when the grid is f64: the CPU x64 invariance
    # pin needs the coordinate chain at full precision, because XLA
    # rematerialises it inside the VJP with shape-dependent fusion order
    # (f32 ulp differences there are far above f64 tolerance).
    coord_dt = jnp.float64 if grid.dtype == jnp.float64 else jnp.float32
    gx = grid[..., 0].astype(coord_dt)
    gy = grid[..., 1].astype(coord_dt)
    # align_corners=False: -1 maps to -0.5, +1 maps to size-0.5.
    fx = ((gx + 1.0) * w - 1.0) * 0.5
    fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0).astype(compute_dtype)[..., None]
    wy = (fy - y0).astype(compute_dtype)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def tap(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat = x.reshape(n, h * w, c)
        idx = yc * w + xc  # [N, H_out, W_out]
        vals = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1), axis=1
        ).reshape(*idx.shape, c)
        return vals * valid[..., None].astype(compute_dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x1)
    v10 = tap(y1, x0)
    v11 = tap(y1, x1)

    one = jnp.asarray(1, dtype=compute_dtype)
    top = v00 * (one - wx) + v01 * wx
    bot = v10 * (one - wx) + v11 * wx
    return top * (one - wy) + bot * wy


def affine_grid(theta: jax.Array, height: int, width: int) -> jax.Array:
    """Generate a sampling grid from inverse 2x3 affine matrices.

    Equivalent to ``torch.nn.functional.affine_grid(theta, [N, C, H, W],
    align_corners=False)``: normalised output coordinates are mapped
    through ``theta`` to normalised input coordinates.

    Args:
        theta: ``[N, 2, 3]`` affine matrices acting on (x, y, 1).

    Returns:
        ``[N, height, width, 2]`` grid suitable for :func:`grid_sample`.
    """
    assert theta.ndim == 3 and theta.shape[1:] == (2, 3)
    # align_corners=False pixel-centre normalised coordinates; f32, widened
    # to f64 when theta is f64 (see grid_sample's coordinate-dtype note).
    coord_dt = jnp.float64 if theta.dtype == jnp.float64 else jnp.float32
    ys = (jnp.arange(height, dtype=coord_dt) * 2 + 1) / height - 1
    xs = (jnp.arange(width, dtype=coord_dt) * 2 + 1) / width - 1
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1)  # [H, W, 3]
    out = jnp.einsum("nij,hwj->nhwi", theta.astype(coord_dt), coords)
    return out  # [N, H, W, 2] = (x, y)
