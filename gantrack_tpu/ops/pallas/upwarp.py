"""Pallas TPU kernel: fused FIR-upsample-2x + affine bilinear warp.

The ADA geometric pipeline is ``upsample2d(x, sym6, up=2)`` →
``grid_sample`` → ``downsample2d`` (reference ``augment_mi.py:297-318``).
Round-2 profiling: the XLA up pass materialises the 2x canvas in HBM
(812x806 bf16 per plane) through depthwise FIR convs running at <10% of
HBM bandwidth, and the Pallas warp then re-reads it window by window —
together ~25% of the train step.

This kernel *never builds the 2x canvas*.  Sampling the upsampled image
bilinearly is a linear map of the 1x image, and for one [TR, TC] output
tile the whole chain factors through VMEM:

* slice an aligned ``[WR1, WC1]`` window of the (pre-padded) 1x image;
* upsample it in-register: ``win2 = Uy @ win1 @ UxT`` with *static*
  banded matrices built from the FIR taps.  Window origins are aligned
  (rows x8, lanes x128) so the zero-stuffing phase takes only two values
  (0 or 8 rows / 0 or 128 lanes) — handled by slicing a double-height
  ``Ubig`` at the dynamic-but-aligned phase offset, not by rebuilding
  banded matrices in-kernel;
* run the tent-hat matmul warp of ``ops/pallas/warp.py`` on ``win2``.

The adjoint (``up_affine_splat``) runs the same tiling in reverse: splat
the cotangent tile into a 2x window accumulator, then project it back to
1x through ``UyT @ acc @ Ux`` and accumulate into the 1x canvas.  The
pair are registered as each other's custom VJPs (arbitrary-order reverse
diff, as the train step requires).

Numerics: exactly ``affine_warp(upsample2d(x, f, up=2), theta)`` for
transforms within the window bounds (verified in
``tests/test_upwarp.py`` against that composition).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import TC, TR, _coeffs, _hat_rows, _mxu_precision, _pad_up

P1 = 3          # 1x pre-pad so the up halo never reads out of bounds
ROW_SLACK = 8   # phase slack: origin alignment quantum (sublanes)
LANE_SLACK = 128


# ------------------------------------------------------------ static FIRs


def _up1d_matrix(f: np.ndarray, n_out: int, n_in: int, shift: int) -> np.ndarray:
    """[n_out, n_in] operator: row v of the up-by-2 image from 1x rows.

    ``up[v] = Σ_m U[v, m] · x[m]`` with ``x`` *pre-padded by P1*, i.e.
    column m corresponds to original row ``m − P1``.  Derived from the
    ``upsample2d`` lowering: zero-stuff by 2, pad ``(fw//2+1, fw//2-1)``
    … the exact tap alignment is fixed by the parity tests; ``shift``
    offsets the output rows (the Ubig phase trick).
    """
    fw = f.shape[0]
    g = f * 2.0  # per-axis up gain (total gain 4 = 2·2 across both axes)
    u = np.zeros((n_out, n_in), np.float32)
    # upsample2d pads the zero-stuffed signal by p0 = (fw+1)//2 = 6 and
    # convolves with the flipped filter:
    #   up[v] = Σ_k f[fw−1−k] · xz[v + k − p0],  xz[2m] = x_orig[m].
    # Columns here are *pre-padded* rows: x[m] = x_orig[m − P1].
    off = (fw + 1) // 2
    for v in range(n_out):
        for k in range(fw):
            z = v + shift + k - off          # zero-stuffed index
            if z % 2 == 0:
                m = z // 2 + P1
                if 0 <= m < n_in:
                    # flip_filter=False ⇒ filter applied flipped
                    u[v, m] += g[fw - 1 - k]
    return u


def _geometry(window: Tuple[int, int]) -> Tuple[int, int, int, int]:
    wr, wc = window
    wr1 = _pad_up(wr // 2 + ROW_SLACK // 2 + fw_halo(), 8)
    wc1 = _pad_up(wc // 2 + LANE_SLACK // 2 + fw_halo(), 128)
    return wr, wc, wr1, wc1


def fw_halo() -> int:
    return 8  # 12-tap FIR: ±3 at 1x, plus slack


def _build_matrices(f: np.ndarray, wr: int, wc: int, wr1: int, wc1: int):
    """(Uy_big [wr+8, wr1], UxT_big [wc1, wc+128]) static operators."""
    uy = _up1d_matrix(f, wr + ROW_SLACK, wr1, 0)
    ux = _up1d_matrix(f, wc + LANE_SLACK, wc1, 0)
    return uy, np.ascontiguousarray(ux.T)


# -------------------------------------------------------------- kernels


def _origin(ax, bx, cx, ay, by, cy, r, c, wr, wc, h2, w2, h1p, w1p, wr1, wc1):
    """Aligned window origins: (r0, c0) on the virtual 2x grid and
    (m0r, m0c) on the padded 1x grid, plus the phase offsets."""
    x0 = (c * TC).astype(jnp.float32)
    y0 = (r * TR).astype(jnp.float32)
    xs = (x0, x0 + TC - 1)
    ys = (y0, y0 + TR - 1)
    fxs = [ax * xa + bx * ya + cx for xa in xs for ya in ys]
    fys = [ay * xa + by * ya + cy for xa in xs for ya in ys]
    fx_min = jnp.minimum(jnp.minimum(fxs[0], fxs[1]), jnp.minimum(fxs[2], fxs[3]))
    fy_min = jnp.minimum(jnp.minimum(fys[0], fys[1]), jnp.minimum(fys[2], fys[3]))
    c0 = jnp.clip(jnp.floor(fx_min) - 1, 0, w2 - wc).astype(jnp.int32)
    r0 = jnp.clip(jnp.floor(fy_min) - 1, 0, h2 - wr).astype(jnp.int32)
    r0 = pl.multiple_of((r0 // 8) * 8, 8)
    c0 = pl.multiple_of((c0 // 128) * 128, 128)
    # 1x origins: m0 = align(r0 // 2); phase δ = r0 − 2·m0 ∈ {0, 8} rows
    # ({0, 128} lanes) because r0 ≡ 0 (mod 8) ⇒ r0/2 ≡ 0 (mod 4).
    m0r = jnp.clip((r0 // 16) * 8, 0, h1p - wr1)
    m0c = jnp.clip((c0 // 256) * 128, 0, w1p - wc1)
    m0r = pl.multiple_of(m0r, 8)
    m0c = pl.multiple_of(m0c, 128)
    dr = pl.multiple_of(r0 - 2 * m0r, 8)
    dc = pl.multiple_of(c0 - 2 * m0c, 128)
    return r0, c0, m0r, m0c, dr, dc, x0, y0


def _extent_mask(r0, c0, wr, wc, h2t, w2t):
    """[wr, wc] 0/1 mask of window cells inside the true 2x canvas."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (wr, wc), 0) + r0
    ci = jax.lax.broadcasted_iota(jnp.int32, (wr, wc), 1) + c0
    return jnp.logical_and(ri < h2t, ci < w2t).astype(jnp.float32)


def _upwarp_kernel(coeff_ref, img_ref, uy_ref, uxt_ref, out_ref, *,
                   wr, wc, wr1, wc1, h2, w2, h2t, w2t, h1p, w1p):
    b = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    dt = img_ref.dtype
    ax, bx, cx, ay, by, cy = _coeffs(coeff_ref, b)
    r0, c0, m0r, m0c, dr, dc, x0, y0 = _origin(
        ax, bx, cx, ay, by, cy, r, c, wr, wc, h2, w2, h1p, w1p, wr1, wc1)

    win1 = img_ref[0, pl.ds(m0r, wr1), pl.ds(m0c, wc1)]       # [wr1, wc1]
    uy = uy_ref[pl.ds(dr, wr), :]                             # [wr, wr1]
    uxt = uxt_ref[:, pl.ds(dc, wc)]                           # [wc1, wc]
    rows2 = jax.lax.dot_general(
        uy.astype(dt), win1, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_mxu_precision(dt),
    ).astype(dt)                                              # [wr, wc1]
    win2 = jax.lax.dot_general(
        rows2, uxt.astype(dt), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_mxu_precision(dt),
    ).astype(dt)                                              # [wr, wc]
    # The FIR tail spills past the true 2x extent; the unfused chain's
    # canvas ends at (h2t, w2t) with zeros beyond (affine_warp pad rule).
    win2 = win2 * _extent_mask(r0, c0, wr, wc, h2t, w2t).astype(dt)

    xi = jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1).astype(jnp.float32) + x0
    r0f = r0.astype(jnp.float32)
    c0f = c0.astype(jnp.float32)
    for y in range(TR):
        yy = y0 + y
        fx = ax * xi + (bx * yy + cx) - c0f
        fy = ay * xi + (by * yy + cy) - r0f
        wx = _hat_rows(fx, wc).astype(dt)
        wy = _hat_rows(fy, wr)
        s = jax.lax.dot_general(
            win2, wx, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mxu_precision(dt),
        )
        val = jnp.sum(wy * s, axis=0, keepdims=True)
        out_ref[0, y : y + 1, :] = val.astype(out_ref.dtype)


def _upsplat_kernel(coeff_ref, g_ref, uy_ref, uxt_ref, out_ref, *,
                    wr, wc, wr1, wc1, h2, w2, h2t, w2t, h1p, w1p):
    b = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(jnp.logical_and(r == 0, c == 0))
    def _():
        out_ref[0] = jnp.zeros((h1p, w1p), out_ref.dtype)

    dt = g_ref.dtype
    ax, bx, cx, ay, by, cy = _coeffs(coeff_ref, b)
    r0, c0, m0r, m0c, dr, dc, x0, y0 = _origin(
        ax, bx, cx, ay, by, cy, r, c, wr, wc, h2, w2, h1p, w1p, wr1, wc1)

    xi = jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1).astype(jnp.float32) + x0
    r0f = r0.astype(jnp.float32)
    c0f = c0.astype(jnp.float32)
    acc = jnp.zeros((wr, wc), jnp.float32)
    for y in range(TR):
        yy = y0 + y
        fx = ax * xi + (bx * yy + cx) - c0f
        fy = ay * xi + (by * yy + cy) - r0f
        wx = _hat_rows(fx, wc).astype(dt)
        wy = _hat_rows(fy, wr)
        g = g_ref[0, y : y + 1, :].astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            (wy * g).astype(dt), wx, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mxu_precision(dt),
        )
    # Transpose of the extent mask: contributions splatted past the true
    # 2x canvas are dropped before projecting back to 1x.
    acc = acc * _extent_mask(r0, c0, wr, wc, h2t, w2t)
    # Project the 2x window gradient back to 1x: UyT @ acc @ Ux.
    uy = uy_ref[pl.ds(dr, wr), :]                             # [wr, wr1]
    uxt = uxt_ref[:, pl.ds(dc, wc)]                           # [wc1, wc]
    acc = acc.astype(dt)
    d_rows = jax.lax.dot_general(
        uy.astype(dt), acc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_mxu_precision(dt),
    ).astype(dt)                                              # [wr1, wc]
    d1 = jax.lax.dot_general(
        d_rows, uxt.astype(dt), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_mxu_precision(dt),
    )                                                         # [wr1, wc1]
    cur = out_ref[0, pl.ds(m0r, wr1), pl.ds(m0c, wc1)].astype(jnp.float32)
    out_ref[0, pl.ds(m0r, wr1), pl.ds(m0c, wc1)] = (cur + d1).astype(out_ref.dtype)


# ------------------------------------------------------------- wrappers


def _prepare(img, fir, window):
    """Pad the 1x planes and build the static operators."""
    b, h1, w1 = img.shape
    # Clamp the window to the virtual 2x extent (small images).
    wr = min(window[0], _pad_up(2 * h1, 8))
    wc = min(window[1], _pad_up(2 * w1, 128))
    wr, wc, wr1, wc1 = _geometry((wr, wc))
    # Virtual up-canvas extent: at least one window (zeros beyond the
    # image — matching affine_warp's bottom/right zero pad).
    h2v = max(2 * h1, wr)
    w2v = max(2 * w1, wc)
    h1p = _pad_up(h1 + 2 * P1, 8)
    w1p = _pad_up(w1 + 2 * P1, 128)
    # Window coverage: m0 can reach (h2v-wr)//2 aligned down; slices must fit.
    h1p = max(h1p, _pad_up((h2v - wr) // 16 * 8 + wr1, 8), wr1)
    w1p = max(w1p, _pad_up((w2v - wc) // 256 * 128 + wc1, 128), wc1)
    imgp = jnp.pad(img, ((0, 0), (P1, h1p - h1 - P1), (P1, w1p - w1 - P1)))
    uy, uxt = _build_matrices(np.asarray(fir, np.float32), wr, wc, wr1, wc1)
    return imgp, jnp.asarray(uy), jnp.asarray(uxt), (wr, wc, wr1, wc1, h1p, w1p, h2v, w2v)


def _upwarp_call(img, coeffs, fir, out_h, out_w, window, interpret):
    b, h1, w1 = img.shape
    imgp, uy, uxt, (wr, wc, wr1, wc1, h1p, w1p, h2, w2) = _prepare(img, fir, window)
    oh, ow = _pad_up(out_h, TR), _pad_up(out_w, TC)
    out = pl.pallas_call(
        functools.partial(_upwarp_kernel, wr=wr, wc=wc, wr1=wr1, wc1=wc1,
                          h2=h2, w2=w2, h2t=2 * h1, w2t=2 * w1,
                          h1p=h1p, w1p=w1p),
        grid=(b, oh // TR, ow // TC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h1p, w1p), lambda b, r, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TR, TC), lambda b, r, c: (b, r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), img.dtype),
        interpret=interpret,
    )(coeffs, imgp, uy.astype(img.dtype), uxt.astype(img.dtype))
    return out[:, :out_h, :out_w]


def _upsplat_call(g, coeffs, fir, h1, w1, window, interpret):
    b, out_h, out_w = g.shape
    dummy = jnp.zeros((b, h1, w1), g.dtype)
    _, uy, uxt, (wr, wc, wr1, wc1, h1p, w1p, h2, w2) = _prepare(dummy, fir, window)
    oh, ow = _pad_up(out_h, TR), _pad_up(out_w, TC)
    g = jnp.pad(g, ((0, 0), (0, oh - out_h), (0, ow - out_w)))
    outp = pl.pallas_call(
        functools.partial(_upsplat_kernel, wr=wr, wc=wc, wr1=wr1, wc1=wc1,
                          h2=h2, w2=w2, h2t=2 * h1, w2t=2 * w1,
                          h1p=h1p, w1p=w1p),
        grid=(b, oh // TR, ow // TC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TR, TC), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h1p, w1p), lambda b, r, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        # f32 canvas: overlapping windows accumulate read-modify-write.
        out_shape=jax.ShapeDtypeStruct((b, h1p, w1p), jnp.float32),
        interpret=interpret,
    )(coeffs, g, uy.astype(g.dtype), uxt.astype(g.dtype))
    return outp[:, P1 : P1 + h1, P1 : P1 + w1]


# --------------------------------------------------- custom VJP closure


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _upwarp_planes(img, coeffs, fir, out_h, out_w, window, interpret):
    return _upwarp_call(img, coeffs, fir, out_h, out_w, window, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _upsplat_planes(g, coeffs, fir, h1, w1, window, interpret, out_hw):
    return _upsplat_call(g, coeffs, fir, h1, w1, window, interpret)


def _upwarp_fwd(img, coeffs, fir, out_h, out_w, window, interpret):
    return (
        _upwarp_call(img, coeffs, fir, out_h, out_w, window, interpret),
        (img.shape, coeffs, jnp.zeros((0,), img.dtype)),
    )


def _upwarp_bwd(fir, out_h, out_w, window, interpret, res, g):
    (b, h1, w1), coeffs, proto = res
    d = _upsplat_planes(g, coeffs, fir, h1, w1, window, interpret, (out_h, out_w))
    return d.astype(proto.dtype), jnp.zeros_like(coeffs)


def _upsplat_fwd(g, coeffs, fir, h1, w1, window, interpret, out_hw):
    return (
        _upsplat_call(g, coeffs, fir, h1, w1, window, interpret),
        (coeffs, jnp.zeros((0,), g.dtype)),
    )


def _upsplat_bwd(fir, h1, w1, window, interpret, out_hw, res, gg):
    coeffs, proto = res
    out_h, out_w = out_hw
    d = _upwarp_planes(gg, coeffs, fir, out_h, out_w, window, interpret)
    return d.astype(proto.dtype), jnp.zeros_like(coeffs)


_upwarp_planes.defvjp(_upwarp_fwd, _upwarp_bwd)
_upsplat_planes.defvjp(_upsplat_fwd, _upsplat_bwd)


def up_affine_warp(
    img: jax.Array,        # [N, H1, W1, C] 1x (already reflect-padded)
    theta: jax.Array,      # [N, 2, 3] normalised inverse transform for the
                           #   *virtual 2x image* (grid_sample convention)
    fir,                   # 1-D FIR taps (hashable tuple or ndarray)
    out_h: int,
    out_w: int,
    window: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """``affine_warp(upsample2d(img, fir, up=2), theta)`` without the 2x
    canvas.  Same contract as :func:`ops.pallas.warp.affine_warp` with the
    input conceptually at ``[N, 2·H1, 2·W1, C]``."""
    n, h1, w1, ch = img.shape
    h2, w2 = 2 * h1, 2 * w1

    t = theta.astype(jnp.float32)
    ax = t[:, 0, 0] * (w2 / out_w)
    bx = t[:, 0, 1] * (w2 / out_h)
    cx = (w2 / 2) * (t[:, 0, 0] * (1 / out_w - 1) + t[:, 0, 1] * (1 / out_h - 1)
                     + t[:, 0, 2] + 1) - 0.5
    ay = t[:, 1, 0] * (h2 / out_w)
    by = t[:, 1, 1] * (h2 / out_h)
    cy = (h2 / 2) * (t[:, 1, 0] * (1 / out_w - 1) + t[:, 1, 1] * (1 / out_h - 1)
                     + t[:, 1, 2] + 1) - 0.5
    coeffs = jnp.stack([ax, bx, cx, ay, by, cy], axis=1)

    fir = np.asarray(fir, np.float32)
    dt = img.dtype if img.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    planes = jnp.transpose(img, (0, 3, 1, 2)).reshape(n * ch, h1, w1).astype(dt)
    coeffs_planes = jnp.repeat(coeffs, ch, axis=0)
    out = _upwarp_planes(planes, coeffs_planes, tuple(fir.tolist()),
                         out_h, out_w, window, interpret)
    return jnp.transpose(out.reshape(n, ch, out_h, out_w), (0, 2, 3, 1)).astype(img.dtype)
