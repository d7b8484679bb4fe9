"""Pallas TPU kernel: batched affine bilinear warp (gather-free).

The ADA geometric augmentation samples every D input through an affine
``grid_sample`` (reference ``augment_mi.py:315-318``).  XLA lowers the
generic gather formulation to scalar loads — profiled at ~420 ms for a
batch-32 warp at 524² on v5e, 76% of the whole training step.  This
kernel removes the gathers entirely:

* per output tile ``[TR=8 rows, TC=128 cols]``, the (affine, monotone)
  source footprint is one contiguous ``[WR, WC]`` window, dynamically
  sliced from the sample's image resident in VMEM;
* bilinear interpolation is expressed as *one-hot hat weights* built
  in-register from ``iota`` and applied as MXU matmuls over the window —
  no data-dependent addressing;
* zeros-padding semantics fall out naturally (out-of-window positions
  get zero weight);
* all tensors are 2-D ``[K, TC]`` column-major stripes — no reshapes or
  transposes (Mosaic layout-friendly).

The backward pass (R1 differentiates through the augment pipe) is the
adjoint splat with the same tiling, accumulating into the per-sample
VMEM image-grad block (sequential TPU grid ⇒ race-free).

Window sizes ``WR/WC`` are static, chosen from transform-magnitude
bounds (same Monte-Carlo machinery as the static reflect-pad margin);
draws beyond them lose their off-window taps — the same tail-clipping
class of behaviour as the reference's ``width-1`` margin clamp.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 32    # output rows per tile (sublane; TR=32 measured ~5% faster than
           # 16 at SG2-ADA 256² — scripts/bench_augment_tiles.py)
TC = 128   # output cols per tile (lane; 256 measured slower)


def _hat_rows(pos_row: jax.Array, height: int) -> jax.Array:
    """[1, TC] positions -> [height, TC] bilinear hat weights (sublane-major)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (height, TC), 0).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - pos_row))


def _coeffs(coeff_ref, b):
    return tuple(coeff_ref[b, i] for i in range(6))


def _window_origin(ax, bx, cx, ay, by, cy, r, c, wr, wc, h_in, w_in):
    """Clamped window start from the tile-corner extremes (affine ⇒ the
    extrema are at corners)."""
    x0 = (c * TC).astype(jnp.float32)
    y0 = (r * TR).astype(jnp.float32)
    xs = (x0, x0 + TC - 1)
    ys = (y0, y0 + TR - 1)
    fxs = [ax * xa + bx * ya + cx for xa in xs for ya in ys]
    fys = [ay * xa + by * ya + cy for xa in xs for ya in ys]
    fx_min = jnp.minimum(jnp.minimum(fxs[0], fxs[1]), jnp.minimum(fxs[2], fxs[3]))
    fy_min = jnp.minimum(jnp.minimum(fys[0], fys[1]), jnp.minimum(fys[2], fys[3]))
    c0 = jnp.clip(jnp.floor(fx_min) - 1, 0, w_in - wc).astype(jnp.int32)
    r0 = jnp.clip(jnp.floor(fy_min) - 1, 0, h_in - wr).astype(jnp.int32)
    # Mosaic requires provably aligned dynamic-slice starts; the window
    # bounds include the alignment slack (window_bounds_for).
    r0 = pl.multiple_of((r0 // 8) * 8, 8)
    c0 = pl.multiple_of((c0 // 128) * 128, 128)
    return r0, c0, x0, y0


def _mxu_precision(dt):
    """Explicit per-dtype MXU precision: the augment pipeline pins
    ``default_matmul_precision('highest')`` for its f32 transform math,
    and that ambient context would otherwise stamp ``fp32`` contract
    precision onto *bf16* kernel matmuls — a combination this Mosaic
    build rejects ('Bad lhs type').  bf16 operands always want the
    one-pass MXU; f32 operands keep the 6-pass exact contraction."""
    return (jax.lax.Precision.DEFAULT if dt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _warp_kernel(coeff_ref, img_ref, out_ref, *, wr, wc, h_in, w_in):
    b = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    dt = img_ref.dtype  # MXU dtype; hats are built f32, applied in dt
    ax, bx, cx, ay, by, cy = _coeffs(coeff_ref, b)
    r0, c0, x0, y0 = _window_origin(ax, bx, cx, ay, by, cy, r, c, wr, wc, h_in, w_in)
    win = img_ref[0, pl.ds(r0, wr), pl.ds(c0, wc)]  # [wr, wc]

    xi = jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1).astype(jnp.float32) + x0
    r0f = r0.astype(jnp.float32)
    c0f = c0.astype(jnp.float32)
    for y in range(TR):
        yy = y0 + y
        fx = ax * xi + (bx * yy + cx) - c0f      # [1, TC]
        fy = ay * xi + (by * yy + cy) - r0f      # [1, TC]
        wx = _hat_rows(fx, wc).astype(dt)        # [wc, TC]
        wy = _hat_rows(fy, wr)                   # [wr, TC] (f32 VPU apply)
        s = jax.lax.dot_general(
            win, wx, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(dt),
        )                                        # [wr, TC]
        val = jnp.sum(wy * s, axis=0, keepdims=True)  # [1, TC]
        out_ref[0, y : y + 1, :] = val.astype(out_ref.dtype)


def _splat_kernel(coeff_ref, g_ref, out_ref, *, wr, wc, h_in, w_in):
    b = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(jnp.logical_and(r == 0, c == 0))
    def _():
        out_ref[0] = jnp.zeros((h_in, w_in), out_ref.dtype)

    dt = g_ref.dtype
    ax, bx, cx, ay, by, cy = _coeffs(coeff_ref, b)
    r0, c0, x0, y0 = _window_origin(ax, bx, cx, ay, by, cy, r, c, wr, wc, h_in, w_in)
    xi = jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1).astype(jnp.float32) + x0
    r0f = r0.astype(jnp.float32)
    c0f = c0.astype(jnp.float32)

    acc = jnp.zeros((wr, wc), jnp.float32)
    for y in range(TR):
        yy = y0 + y
        fx = ax * xi + (bx * yy + cx) - c0f
        fy = ay * xi + (by * yy + cy) - r0f
        wx = _hat_rows(fx, wc).astype(dt)        # [wc, TC]
        wy = _hat_rows(fy, wr)                   # [wr, TC]
        g = g_ref[0, y : y + 1, :].astype(jnp.float32)  # [1, TC]
        acc = acc + jax.lax.dot_general(
            (wy * g).astype(dt), wx, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(dt),
        )                                        # [wr, wc]
    cur = out_ref[0, pl.ds(r0, wr), pl.ds(c0, wc)].astype(jnp.float32)
    out_ref[0, pl.ds(r0, wr), pl.ds(c0, wc)] = (cur + acc).astype(out_ref.dtype)


def _pad_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# The warp and its adjoint (splat) are both linear in their image input;
# each is registered as the other's VJP, so arbitrary-order derivatives
# (R1's double-backward differentiates *through* the augment warp)
# ping-pong between the two kernels.

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _affine_warp_planes(img, coeffs, out_h, out_w, wr, wc, interpret):
    return _warp_call(img, coeffs, out_h, out_w, wr, wc, interpret)


def _warp_call(img, coeffs, out_h, out_w, wr, wc, interpret):
    b, h_in, w_in = img.shape
    oh, ow = _pad_up(out_h, TR), _pad_up(out_w, TC)
    grid = (b, oh // TR, ow // TC)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, wr=wr, wc=wc, h_in=h_in, w_in=w_in),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h_in, w_in), lambda b, r, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TR, TC), lambda b, r, c: (b, r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), img.dtype),
        interpret=interpret,
    )(coeffs, img)
    return out[:, :out_h, :out_w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _affine_splat_planes(g, coeffs, h_in, w_in, wr, wc, interpret, out_hw):
    return _splat_call(g, coeffs, h_in, w_in, wr, wc, interpret)


def _splat_call(g, coeffs, h_in, w_in, wr, wc, interpret):
    b, out_h, out_w = g.shape
    oh, ow = _pad_up(out_h, TR), _pad_up(out_w, TC)
    g = jnp.pad(g, ((0, 0), (0, oh - out_h), (0, ow - out_w)))
    grid = (b, oh // TR, ow // TC)
    return pl.pallas_call(
        functools.partial(_splat_kernel, wr=wr, wc=wc, h_in=h_in, w_in=w_in),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TR, TC), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_in, w_in), lambda b, r, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        # f32 canvas: adjacent tiles' (aligned, clamped) windows overlap,
        # so the splat accumulates read-modify-write — bf16 RMW would
        # compound rounding. Cast to the cotangent dtype in the VJP.
        out_shape=jax.ShapeDtypeStruct((b, h_in, w_in), jnp.float32),
        interpret=interpret,
    )(coeffs, g)


def _affine_warp_fwd(img, coeffs, out_h, out_w, wr, wc, interpret):
    return (
        _warp_call(img, coeffs, out_h, out_w, wr, wc, interpret),
        (img.shape, coeffs, jnp.zeros((0,), img.dtype)),
    )


def _affine_warp_bwd(out_h, out_w, wr, wc, interpret, res, g):
    (b, h_in, w_in), coeffs, proto = res
    img_grad = _affine_splat_planes(
        g, coeffs, h_in, w_in, wr, wc, interpret, (out_h, out_w)
    )
    return img_grad.astype(proto.dtype), jnp.zeros_like(coeffs)


def _affine_splat_fwd(g, coeffs, h_in, w_in, wr, wc, interpret, out_hw):
    return _splat_call(g, coeffs, h_in, w_in, wr, wc, interpret), (coeffs, jnp.zeros((0,), g.dtype))


def _affine_splat_bwd(h_in, w_in, wr, wc, interpret, out_hw, res, gg):
    coeffs, proto = res
    out_h, out_w = out_hw
    g_grad = _affine_warp_planes(gg, coeffs, out_h, out_w, wr, wc, interpret)
    return g_grad.astype(proto.dtype), jnp.zeros_like(coeffs)


_affine_warp_planes.defvjp(_affine_warp_fwd, _affine_warp_bwd)
_affine_splat_planes.defvjp(_affine_splat_fwd, _affine_splat_bwd)


def window_bounds_for(max_scale: float, max_shear: float) -> Tuple[int, int]:
    """Static window sizes from transform bounds.

    ``max_scale`` bounds |∂src/∂same-axis| (a, d entries); ``max_shear``
    bounds the cross terms (b, c).  +4 covers the bilinear halo and the
    floor/clamp guards; +8/+128 covers the aligned-origin flooring.
    """
    wr = int(np.ceil(max_scale * TR + max_shear * TC)) + 4 + 8
    wc = int(np.ceil(max_scale * TC + max_shear * TR)) + 4 + 128
    return _pad_up(wr, 8), _pad_up(wc, 128)


def affine_warp(
    img: jax.Array,        # [N, H_in, W_in, C] float
    theta: jax.Array,      # [N, 2, 3] normalised inverse transform (grid_sample convention)
    out_h: int,
    out_w: int,
    window: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """grid_sample(img, affine_grid(theta, out)) with a Pallas kernel.

    Matches ``ops.grid_sample.grid_sample(img, affine_grid(theta))``
    (bilinear, zeros padding, align_corners=False) for transforms within
    the static ``window`` bounds.  Channels are folded into the batch
    grid dimension.
    """
    n, h_in, w_in, c = img.shape
    wr, wc = window
    wr = min(wr, _pad_up(h_in, 8))
    wc = min(wc, _pad_up(w_in, 128))

    t = theta.astype(jnp.float32)
    # Pixel-space coefficients (align_corners=False):
    #   gx_out = (2x+1)/W_out - 1 ; fx = ((gx_in+1)*W_in - 1)/2.
    ax = t[:, 0, 0] * (w_in / out_w)
    bx = t[:, 0, 1] * (w_in / out_h)
    cx = (w_in / 2) * (t[:, 0, 0] * (1 / out_w - 1) + t[:, 0, 1] * (1 / out_h - 1)
                       + t[:, 0, 2] + 1) - 0.5
    ay = t[:, 1, 0] * (h_in / out_w)
    by = t[:, 1, 1] * (h_in / out_h)
    cy = (h_in / 2) * (t[:, 1, 0] * (1 / out_w - 1) + t[:, 1, 1] * (1 / out_h - 1)
                       + t[:, 1, 2] + 1) - 0.5
    coeffs = jnp.stack([ax, bx, cx, ay, by, cy], axis=1)  # [N, 6]

    # Zero-pad so [wr, wc] windows always fit (right/bottom padding leaves
    # pixel coordinates unchanged; padded zeros = the zeros-padding rule).
    pad_h = max(0, wr - h_in)
    pad_w = max(0, wc - w_in)
    if pad_h or pad_w:
        img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        h_in += pad_h
        w_in += pad_w

    dt = img.dtype if img.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    planes = jnp.transpose(img, (0, 3, 1, 2)).reshape(n * c, h_in, w_in).astype(dt)
    coeffs_planes = jnp.repeat(coeffs, c, axis=0)
    out = _affine_warp_planes(planes, coeffs_planes, out_h, out_w, wr, wc, interpret)
    return jnp.transpose(out.reshape(n, c, out_h, out_w), (0, 2, 3, 1)).astype(img.dtype)
