"""Pallas TPU kernel: depthwise separable FIR resampling, NHWC-native.

PARKED (round 3, measured): on the v5e chip the ``up2`` form lowers and
is exact but moves only ~68 GB/s vs ~264 GB/s for XLA's depthwise conv
on the same shape (G-post-up 256² ×64: 8.0 ms vs 2.1 ms), and the
``same``/``down2`` forms hit a hard Mosaic limitation — ``pl.Element``
block specs with *low* padding ("Low padding not supported yet"), which
the halo windows need whenever py0 > 0.  XLA's ~60%-of-peak depthwise
FIR stands as the production lowering (`ops/upfirdn2d.py`); this kernel
is kept correct (interpret-mode tests in ``tests/test_pallas_fir.py``)
in case a later Mosaic release lifts the Element-padding limit and the
bandwidth gap.  Reproduce with ``scripts/bench_pallas_fir.py``.

The SG2/SG3 networks run ~30 small-tap FIR passes per train step (the
``conv2d_resample`` up/down chains, reference
``torch_utils/ops/upfirdn2d.py``).  They are pure bandwidth: ~16 taps of
VPU work per element against a full HBM round trip.  Measured on the
axon v5e chip, XLA's depthwise-conv lowering moves ~490 GB/s — ~60% of
peak — and every relayout-based rewrite (banded matmuls at model widths,
kernel composition, two 1-D passes) measured *slower* because NHWC
layout churn dominates (see docs/evidence/mxu_floor.md).

This kernel keeps the NHWC layout untouched: C stays on lanes, W on
sublanes, and H — an *untiled* dimension of the rank-4 block — carries
the stencil halo via ``pl.Element`` block indexing (element-granular row
offsets are legal on the untiled dim, so the halo costs no alignment
slack).  Per grid step it loads one row window, applies the vertical
taps as row FMAs over the untiled dim and the horizontal taps as static
sublane shifts, and writes ``[TH, W_out, C]``.  All horizontal edge
handling rides the shifts' two-sided zero fill — which is exactly
``upfirdn2d``'s zero-pad contract — so no padded copy of the input is
ever materialised:

* ``same``  (up=down=1): plain stencil.  Out-of-range halo rows are NaN
  (Element padding) and are masked to zero.
* ``down2``: vertical decimation strides the row FMAs; horizontal
  decimation computes the full-rate row then deinterleaves columns via
  the row-major-free regroup ``[TH, W, C] -> [TH, W/2, 2C]`` (even
  columns are the low C lanes).
* ``up2``: zero-stuffing never materialises — each output row/column
  parity is its own ≤⌈k/2⌉-tap stencil over 1x data; column phases
  interleave through the inverse lane regroup, row phases through a
  free stack+reshape on the untiled dim.

The three forms close under transposition (adjoint(same) = same with
flipped taps + complementary padding; adjoint(down2) = up2; adjoint(up2)
= down2), so one custom VJP covers arbitrary-order autodiff, as the
train step's double-backprop (R1/PL) requires.

Numerics: bf16 inputs, f32 accumulation — the same contract as the
``lax.conv_general_dilated`` lowering in ``ops/upfirdn2d.py`` (parity
tested in ``tests/test_pallas_fir.py``).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM limit is 16 MB; the kernels' f32
# intermediates (masked window + accumulator + shifted partials) run
# ~2.5x the _pick_th estimate, so give them real headroom — v5e has
# 128 MB of VMEM per core.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _row_mask(r0, n_rows: int, h: int):
    """[n_rows, 1, 1] bool mask of window rows inside the true image —
    zeroes both the FIR's logical zero-padding and the NaN Element halo."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1, 1), 0) + r0
    return jnp.logical_and(ri >= 0, ri < h)


def _hshift(v, s: int, wo: int):
    """Static horizontal resize+shift: column ``q`` of the ``[TH, wo, C]``
    result is column ``q + s`` of ``v`` (zero outside ``v``'s extent)."""
    th, w, c = v.shape
    lo = max(0, -s)                       # leading zeros
    n = max(0, min(w, wo + s) - max(0, s))  # columns copied from v
    hi = wo - lo - n
    parts = []
    if lo:
        parts.append(jnp.zeros((th, lo, c), v.dtype))
    if n:
        parts.append(v[:, max(0, s) : max(0, s) + n, :])
    if hi:
        parts.append(jnp.zeros((th, hi, c), v.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


# --------------------------------------------------------------- kernels


def _fir_same_kernel(x_ref, o_ref, *, taps_y, taps_x, py0, px0, h, th):
    """o[v,u,c] = Σ_{i,j} fy[i]·fx[j]·X[r0+v+i−py0, u+j−px0, c]."""
    r = pl.program_id(1)
    ky, kx = len(taps_y), len(taps_x)
    win = x_ref[...]                                 # [th+ky-1, w, c]
    wo = o_ref.shape[2]
    mask = _row_mask(r * th - py0, th + ky - 1, h)
    winz = jnp.where(mask, win, 0).astype(jnp.float32)
    acc = taps_y[0] * winz[0:th]
    for i in range(1, ky):
        acc = acc + taps_y[i] * winz[i : i + th]
    out = taps_x[0] * _hshift(acc, -px0, wo)
    for j in range(1, kx):
        out = out + taps_x[j] * _hshift(acc, j - px0, wo)
    o_ref[0] = out.astype(o_ref.dtype)


def _fir_down2_kernel(x_ref, o_ref, *, taps_y, taps_x, py0, px0, h, th):
    """o[v,u,c] = Σ_{i,j} fy[i]·fx[j]·X[2(r0+v)+i−py0, 2u+j−px0, c]."""
    r = pl.program_id(1)
    ky, kx = len(taps_y), len(taps_x)
    win = x_ref[...]                                 # [2·th+ky-1, w, c]
    c = win.shape[-1]
    wo = o_ref.shape[2]
    mask = _row_mask(2 * r * th - py0, 2 * th + ky - 1, h)
    winz = jnp.where(mask, win, 0).astype(jnp.float32)
    w = win.shape[1]

    def _even_rows(i):
        # rows i, i+2, …, i+2(th−1); a strided slice would lower to an
        # unsupported Mosaic gather — pair-reshape the untiled dim instead.
        return winz[i : i + 2 * th].reshape(th, 2, w, c)[:, 0]

    acc = taps_y[0] * _even_rows(0)
    for i in range(1, ky):
        acc = acc + taps_y[i] * _even_rows(i)                   # [th, w, c]
    t = taps_x[0] * _hshift(acc, -px0, 2 * wo)
    for j in range(1, kx):
        t = t + taps_x[j] * _hshift(acc, j - px0, 2 * wo)
    # Stuffed-rate row t: out[u] = t[2u].  The regroup [th, 2wo, c] ->
    # [th, wo, 2c] is row-major-free; even columns are the low c lanes.
    o_ref[0] = t.reshape(th, wo, 2 * c)[:, :, :c].astype(o_ref.dtype)


def _fir_up2_kernel(x_ref, o_ref, *, taps_y, taps_x, py0, px0, h, th, s0):
    """o[v,u,c] = Σ_{i,j} fy[i]·fx[j]·Z[r0+v+i−py0, u+j−px0, c] with
    ``Z`` the ×2 zero-stuffed image (Z[2m]=X[m], rows and cols)."""
    r = pl.program_id(1)
    ky, kx = len(taps_y), len(taps_x)
    win = x_ref[...]                                  # [n_in, w, c]
    n_in, w_in, c = win.shape
    th2 = th // 2
    mask = _row_mask(r * th2 + s0, n_in, h)
    winz = jnp.where(mask, win, 0).astype(jnp.float32)

    # Vertical phases: out row v = r·th + 2t + pr (th even ⇒ parity(v) =
    # pr).  Tap i contributes iff stuffed row v+i−py0 is even, i.e.
    # (pr+i−py0) even, reading 1x row r·th2 + t + (pr+i−py0)/2 — a static
    # window offset (pr+i−py0)/2 − s0.
    rows = []
    for pr in (0, 1):
        acc = None
        for i in range(ky):
            d = pr + i - py0
            if d % 2 != 0:
                continue
            woff = d // 2 - s0
            term = taps_y[i] * winz[woff : woff + th2]
            acc = term if acc is None else acc + term
        rows.append(acc if acc is not None else
                    jnp.zeros((th2, w_in, c), jnp.float32))

    # Horizontal phases: out col u2 = 2u + pc reads 1x col u + (pc+j−px0)/2
    # when even — a static shift; _hshift's zero fill covers both edges.
    w2 = o_ref.shape[2]
    wc2 = w2 // 2
    quads = []
    for pr in (0, 1):
        for pc in (0, 1):
            acc = None
            for j in range(kx):
                d = pc + j - px0
                if d % 2 != 0:
                    continue
                term = taps_x[j] * _hshift(rows[pr], d // 2, wc2)
                acc = term if acc is None else acc + term
            if acc is None:
                acc = jnp.zeros((th2, wc2, c), jnp.float32)
            quads.append(acc)
    # Columns: concat (even, odd) on lanes then regroup [.., wc2, 2c] ->
    # [.., w2, c] (row-major-free).  Rows: stack parities on the untiled
    # dim and fold — also free.
    re = jnp.concatenate([quads[0], quads[1]], axis=-1).reshape(th2, w2, c)
    ro = jnp.concatenate([quads[2], quads[3]], axis=-1).reshape(th2, w2, c)
    out = jnp.stack([re, ro], axis=1).reshape(th, w2, c)
    o_ref[0] = out.astype(o_ref.dtype)


# -------------------------------------------------------------- wrappers


INTERPRET = False  # tests flip this to run the kernels on CPU


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_th(w: int, c: int, itemsize: int, rows_per_out: float, ky: int) -> int:
    """Largest TH (multiple of 8, ≤128) keeping in+out double-buffered
    windows under ~20 MB of VMEM (plus f32 headroom for intermediates;
    measured real usage is ~2.5x this estimate, against the 100 MB
    scoped limit set in ``_COMPILER_PARAMS``)."""
    budget = 20 * 2**20
    th = 128
    while th > 8:
        win_rows = int(th * rows_per_out) + ky
        vmem = 2 * win_rows * w * c * itemsize + 2 * th * w * c * itemsize \
            + 2 * th * w * c * 4
        if vmem <= budget:
            break
        th //= 2
    return max(th, 8)


def _call_same(x, taps_y, taps_x, padding):
    n, h, w, c = x.shape
    py0, py1, px0, px1 = padding
    ky, kx = len(taps_y), len(taps_x)
    out_h = h + py0 + py1 - ky + 1
    out_w = w + px0 + px1 - kx + 1
    th = _pick_th(w, c, x.dtype.itemsize, 1.0, ky)
    oh = _ceil_to(out_h, th)
    ow = _ceil_to(out_w, 8)
    hi = max(0, oh + ky - 1 - py0 - h)
    out = pl.pallas_call(
        functools.partial(_fir_same_kernel, taps_y=taps_y, taps_x=taps_x,
                          py0=py0, px0=px0, h=h, th=th),
        grid=(n, oh // th),
        # Mosaic requires every non-squeezed dim of an element-indexed
        # block to be Element; N is squeezed, W/C are full-extent windows.
        in_specs=[pl.BlockSpec(
            (None, pl.Element(th + ky - 1, (py0, hi)),
             pl.Element(w), pl.Element(c)),
            lambda b, r: (b, r * th, 0, 0))],
        out_specs=pl.BlockSpec((1, th, ow, c), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(x)
    return out[:, :out_h, :out_w, :]


def _call_down2(x, taps_y, taps_x, padding):
    n, h, w, c = x.shape
    py0, py1, px0, px1 = padding
    ky, kx = len(taps_y), len(taps_x)
    out_h = (h + py0 + py1 - ky) // 2 + 1
    out_w = (w + px0 + px1 - kx) // 2 + 1
    th = _pick_th(w, c, x.dtype.itemsize, 2.0, ky)
    oh = _ceil_to(out_h, th)
    ow = _ceil_to(out_w, 8)
    hi = max(0, 2 * (oh - 1) + ky - py0 - h)
    out = pl.pallas_call(
        functools.partial(_fir_down2_kernel, taps_y=taps_y, taps_x=taps_x,
                          py0=py0, px0=px0, h=h, th=th),
        grid=(n, oh // th),
        in_specs=[pl.BlockSpec(
            (None, pl.Element(2 * th + ky - 1, (py0, hi)),
             pl.Element(w), pl.Element(c)),
            lambda b, r: (b, 2 * r * th, 0, 0))],
        out_specs=pl.BlockSpec((1, th, ow, c), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(x)
    return out[:, :out_h, :out_w, :]


def _call_up2(x, taps_y, taps_x, padding):
    n, h, w, c = x.shape
    py0, py1, px0, px1 = padding
    ky, kx = len(taps_y), len(taps_x)
    out_h = 2 * h + py0 + py1 - ky + 1
    out_w = 2 * w + px0 + px1 - kx + 1
    th = max(16, _pick_th(w, c, x.dtype.itemsize, 0.5, ky))
    oh = _ceil_to(out_h, th)
    ow = _ceil_to(out_w, 8)
    th2 = th // 2
    # 1x window rows for output rows [r·th, r·th+th): r·th2 + t + d/2 for
    # even d = pr+i−py0 ∈ [−py0, ky−py0]; s0 is a safe (static) lower
    # bound of d/2, n_in a safe row count.
    s0 = -(py0 // 2 + 1)
    n_in = th2 + (ky - py0) // 2 + 1 - s0
    hi = max(0, (oh // th - 1) * th2 + s0 + n_in - h)
    out = pl.pallas_call(
        functools.partial(_fir_up2_kernel, taps_y=taps_y, taps_x=taps_x,
                          py0=py0, px0=px0, h=h, th=th, s0=s0),
        grid=(n, oh // th),
        in_specs=[pl.BlockSpec(
            (None, pl.Element(n_in, (-s0, hi)),
             pl.Element(w), pl.Element(c)),
            lambda b, r: (b, r * (th // 2), 0, 0))],
        out_specs=pl.BlockSpec((1, th, ow, c), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(x)
    return out[:, :out_h, :out_w, :]


# ------------------------------------------------------------ custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _fir(x, taps_y, taps_x, up, down, padding, xshape):
    if up == 2:
        return _call_up2(x, taps_y, taps_x, padding)
    if down == 2:
        return _call_down2(x, taps_y, taps_x, padding)
    return _call_same(x, taps_y, taps_x, padding)


def _fir_fwd(x, taps_y, taps_x, up, down, padding, xshape):
    # Residuals must be jax types; the input dtype rides a 0-size proto.
    return (_fir(x, taps_y, taps_x, up, down, padding, xshape),
            jnp.zeros((0,), x.dtype))


def _fir_bwd(taps_y, taps_x, up, down, padding, xshape, res, g):
    (n, h, w, c), dt = xshape, res.dtype
    ky, kx = len(taps_y), len(taps_x)
    py0, py1, px0, px1 = padding
    fy = tuple(reversed(taps_y))
    fx = tuple(reversed(taps_x))
    gh, gw = g.shape[1], g.shape[2]
    qy0 = ky - 1 - py0
    qx0 = kx - 1 - px0
    if up == 2:
        # adjoint of up2 = down2 with flipped taps; stuffed-grid pad
        # q0 = k−1−p0, high pads solved so the output size equals (h, w):
        # (gh + qy0 + qy1 − ky)//2 + 1 = h.
        qy1 = 2 * h - 2 + ky - qy0 - gh
        qx1 = 2 * w - 2 + kx - qx0 - gw
        d = _fir(g.astype(dt), fy, fx, 1, 2, (qy0, qy1, qx0, qx1), g.shape)
    elif down == 2:
        # adjoint of down2 = up2: 2·gh + qy0 + qy1 − ky + 1 = h.
        qy1 = h + ky - 1 - qy0 - 2 * gh
        qx1 = w + kx - 1 - qx0 - 2 * gw
        d = _fir(g.astype(dt), fy, fx, 2, 1, (qy0, qy1, qx0, qx1), g.shape)
    else:
        qy1 = ky - 1 - py1
        qx1 = kx - 1 - px1
        d = _fir(g.astype(dt), fy, fx, 1, 1, (qy0, qy1, qx0, qx1), g.shape)
    return (d.astype(dt),)


_fir.defvjp(_fir_fwd, _fir_bwd)


def fir2d(
    x: jax.Array,
    taps_y: Sequence[float],
    taps_x: Sequence[float],
    up: int = 1,
    down: int = 1,
    padding: Tuple[int, int, int, int] = (0, 0, 0, 0),
    gain: float = 1.0,
    flip: bool = False,
) -> jax.Array:
    """Depthwise separable FIR with the :func:`ops.upfirdn2d.upfirdn2d`
    numerics contract: pad/crop by ``padding`` = (py0, py1, px0, px1) on
    the up-rate grid, *convolve* (i.e. apply taps flipped unless
    ``flip``) with ``taps_y ⊗ taps_x`` scaled by ``gain``, keep every
    ``down``-th sample.  up/down ∈ {1, 2}, not both 2."""
    assert up in (1, 2) and down in (1, 2) and not (up == 2 and down == 2)
    fy = np.asarray(taps_y, np.float64)
    fx = np.asarray(taps_x, np.float64)
    # upfirdn2d scales by gain**(ndim/2) per axis pair ⇒ √gain per axis.
    ga = float(gain) ** 0.5
    if not flip:
        fy, fx = fy[::-1], fx[::-1]
    ty = tuple((fy * ga).tolist())
    tx = tuple((fx * ga).tolist())
    return _fir(x, ty, tx, up, down, tuple(int(p) for p in padding), x.shape)
