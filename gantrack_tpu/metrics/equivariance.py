"""Equivariance metrics EQ-T / EQ-T_frac / EQ-R (StyleGAN3-only).

Capability parity with the reference ``metrics/equivariance.py``: PSNR
between (a) synthesising with a transformed input grid (via the SG3
``SynthesisInput`` user transform) and (b) transforming the synthesised
image; integer/fractional translation and rotation variants.

The image-space reference transforms use integer rolls (EQ-T) and the
bilinear warp (EQ-T_frac / EQ-R); the mutual PSNR is measured on the
valid overlapping region.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import affine_grid, grid_sample
from .metric_utils import MetricOptions


def _psnr(a: jax.Array, b: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """PSNR over [-1,1]-range images (peak = 2)."""
    if mask is None:
        mse = jnp.mean(jnp.square(a - b))
    else:
        mse = jnp.sum(jnp.square((a - b) * mask)) / jnp.maximum(jnp.sum(mask), 1)
    return 20.0 * jnp.log10(2.0) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-20))


def apply_integer_translation(x: jax.Array, tx: float, ty: float):
    """Integer pixel roll + validity mask (reference ``equivariance.py:44``)."""
    h, w = x.shape[1], x.shape[2]
    ix, iy = int(np.rint(tx * w)), int(np.rint(ty * h))
    y = jnp.roll(x, (iy, ix), axis=(1, 2))
    mask = np.ones((1, h, w, 1), np.float32)
    if iy > 0:
        mask[:, :iy] = 0
    elif iy < 0:
        mask[:, iy:] = 0
    if ix > 0:
        mask[:, :, :ix] = 0
    elif ix < 0:
        mask[:, :, ix:] = 0
    return y, jnp.asarray(mask)


def apply_fractional_translation(x: jax.Array, tx: float, ty: float):
    """Bilinear sub-pixel translation + interior mask (reference ``:63``)."""
    h, w = x.shape[1], x.shape[2]
    theta = jnp.asarray(
        np.tile(np.array([[1, 0, -2 * tx], [0, 1, -2 * ty]], np.float32), (x.shape[0], 1, 1))
    )
    y = grid_sample(x, affine_grid(theta, h, w))
    mask = np.ones((1, h, w, 1), np.float32)
    bx, by = int(np.ceil(abs(tx) * w)) + 1, int(np.ceil(abs(ty) * h)) + 1
    mask[:, :by] = 0
    mask[:, -by:] = 0
    mask[:, :, :bx] = 0
    mask[:, :, -bx:] = 0
    return y, jnp.asarray(mask)


def apply_rotation(x: jax.Array, angle: float):
    """Bilinear rotation about the centre + inscribed-disc mask
    (reference ``:169``)."""
    h, w = x.shape[1], x.shape[2]
    c, s = np.cos(angle), np.sin(angle)
    theta = jnp.asarray(
        np.tile(np.array([[c, s, 0], [-s, c, 0]], np.float32), (x.shape[0], 1, 1))
    )
    y = grid_sample(x, affine_grid(theta, h, w))
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    mask = ((xx**2 + yy**2) < (1 - 2 / min(h, w)) ** 2).astype(np.float32)[None, :, :, None]
    return y, jnp.asarray(mask)


def compute_equivariance_metrics(
    opts: MetricOptions,
    num_samples: int = 200,
    translate_max: float = 0.125,
    rotate_max: float = 1.0,
    compute_eqt_int: bool = True,
    compute_eqt_frac: bool = True,
    compute_eqr: bool = True,
) -> dict:
    """Driver (reference ``equivariance.py:192``).

    ``opts.generator_with_transform(z, c, transform_3x3)`` must synthesise
    with the given user transform injected into the SG3 input (see
    ``tools/gen_images.make_transform``).
    """
    gen_t = getattr(opts, "generator_with_transform", None)
    assert gen_t is not None, "equivariance needs a transform-capable generator"
    rng = np.random.default_rng(opts.seed)
    sums = {}
    counts = {}
    bs = min(opts.batch_size, 8)
    done = 0
    while done < num_samples:
        z = jnp.asarray(rng.standard_normal((bs, opts.z_dim)), jnp.float32)
        ref = gen_t(z, None, np.eye(3, dtype=np.float32))

        if compute_eqt_int:
            t = (rng.random(2) * 2 - 1) * translate_max
            m = np.eye(3, dtype=np.float32)
            m[0, 2], m[1, 2] = -t[0] * 2, -t[1] * 2  # normalised input shift
            img_t = gen_t(z, None, m)
            want, mask = apply_integer_translation(ref, t[0], t[1])
            sums["eqt_int"] = sums.get("eqt_int", 0) + float(_psnr(img_t, want, mask))
            counts["eqt_int"] = counts.get("eqt_int", 0) + 1
        if compute_eqt_frac:
            t = (rng.random(2) * 2 - 1) * translate_max
            m = np.eye(3, dtype=np.float32)
            m[0, 2], m[1, 2] = -t[0] * 2, -t[1] * 2
            img_t = gen_t(z, None, m)
            want, mask = apply_fractional_translation(ref, t[0], t[1])
            sums["eqt_frac"] = sums.get("eqt_frac", 0) + float(_psnr(img_t, want, mask))
            counts["eqt_frac"] = counts.get("eqt_frac", 0) + 1
        if compute_eqr:
            angle = (rng.random() * 2 - 1) * np.pi * rotate_max
            c, s = np.cos(angle), np.sin(angle)
            m = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            img_t = gen_t(z, None, m)
            want, mask = apply_rotation(ref, angle)
            sums["eqr"] = sums.get("eqr", 0) + float(_psnr(img_t, want, mask))
            counts["eqr"] = counts.get("eqr", 0) + 1
        done += bs

    return {k: sums[k] / counts[k] for k in sums}
