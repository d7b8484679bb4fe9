"""Pallas TPU kernel: implicit-GEMM 3×3 stride-1 convolution (NHWC).

STATUS (round 2, measured): **parked, not wired into the models.**
Round-1 profiling suggested the 256²×64 conv family ran at 6-13% of MXU
peak; that turned out to be a microbench layout artifact — in-step XLA
conv fusions run at 30-60% MXU and beat this kernel at the hot shapes
(XLA ~32 TF/s vs ~23 TF/s, chained A/B in scripts/bench_conv3x3.py).
The kernel is kept as a complete, exact, arbitrary-order-differentiable
implicit-GEMM conv (tested in tests/test_conv3x3.py) and as the record
of the Mosaic constraint set that shaped it; see docs/ROADMAP.md.

Design (constraints measured on this Mosaic build, scripts/probe_mosaic.py:
async-DMA slices need sublane extents ×8 and lane extents ×128, while
*value* slicing/concat after an aligned load is unrestricted):

* **Width-fold.** For C=64 the NHWC array is reinterpreted as
  ``[N, H, W/2, 128]`` — a *free* reshape, since adjacent width
  positions are adjacent in memory.  A 3×3 conv on the original image
  is exactly a 3×3 conv on the folded image with a block-banded weight
  matrix ``W'[3, 3, 2C, 2Co]`` (``_fold_weights``): folded tap ``dX``
  maps original tap ``k = f·dX + p − q − f + 1`` for input half ``p``
  and output half ``q``.  Lanes are now 128-aligned and the MXU GEMM
  runs full width.  C that is already a multiple of 128 skips the fold.
* grid ``(N, H/TH)``; each step DMAs one aligned ``[TH+2, WFP, CC]``
  halo row window from HBM, double-buffered so the copy of block
  ``i+1`` overlaps the GEMM of block ``i``;
* the 9 shifted taps are *value*-sliced from the loaded window and
  concatenated lane-wise into an im2col patch matrix ``[TH·WF, 9·CC]``
  that never exists in HBM (the round-1 XLA im2col failure mode was
  exactly its HBM materialisation);
* one MXU GEMM ``[TH·WF, 9·CC] × [9·CC, CCo]`` per step with float32
  accumulation.

Gradients close under the family: ``dx`` is this same kernel applied to
the cotangent with the spatially-flipped, ci↔co-transposed weights, and
``dw`` is an accumulating patchesᵀ·g kernel (``wgrad3x3``, dy-split grid
to bound its VMEM accumulator; the folded weight grad is pulled back to
``[3,3,C,Co]`` with ``jax.linear_transpose`` of the fold).  Both carry
JVP + transpose rules referencing each other, so the R1 / path-length
double-backward resolves entirely within these kernels.

Replaces the CUDA-side efficiency role of the reference's plugin convs
(``torch_utils/ops/conv2d_gradfix.py``, ``conv2d_resample.py:46-141``);
numerics are the plain correlation contract of ``lax.conv`` (SAME, no
flip), verified against XLA in ``tests/test_conv3x3.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "wgrad3x3", "supported"]

_VMEM_BUDGET = 10 * 1024 * 1024


def _fold_factor(ci: int) -> int:
    if ci % 128 == 0:
        return 1
    if ci == 64:
        return 2
    return 0


def _geometry(x_shape, co, dtype):
    """(f, th, wf, wfp, cc, cco) or None if unsupported."""
    n, h, w, ci = x_shape
    f = _fold_factor(ci)
    if f == 0 or w % f != 0:
        return None
    cc, cco = f * ci, f * co
    wf = w // f
    if wf % 8 != 0 or wf < 8 or cco % 64 != 0 or cc > 1024 or cco > 1024:
        return None
    wfp = ((wf + 2 + 7) // 8) * 8
    esize = jnp.dtype(dtype).itemsize
    for th in (16, 8, 4):
        if h % th != 0:
            continue
        m = th * wf
        vmem = (
            2 * (th + 2) * wfp * cc * esize      # double-buffered window
            + 3 * (th + 2) * wf * cc * esize     # dx-shifted window values
            + 9 * cc * cco * esize               # weights
            + m * cco * (4 + esize)              # f32 acc + out block
        )
        if vmem <= _VMEM_BUDGET:
            return (f, th, wf, wfp, cc, cco)
    return None


def supported(x_shape, w_shape, dtype) -> bool:
    """Shapes this kernel accepts (the SG2/SG3 3×3 stride-1 family)."""
    n, h, w, ci = x_shape
    kh, kw, wci, co = w_shape
    if (kh, kw) != (3, 3) or wci != ci:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if h < 4 or w < 8:
        return False
    return _geometry(x_shape, co, dtype) is not None


# ----------------------------------------------------------- fold helpers


def _fold_weights(w: jax.Array, f: int) -> jax.Array:
    """[3,3,C,Co] → flattened folded [9·fC, fCo] (dy-major, dX-minor rows)."""
    kh, kw, c, co = w.shape
    if f == 1:
        return w.reshape(9 * c, co)
    w2 = jnp.zeros((3, 3, f, c, f, co), w.dtype)
    for dx in range(3):
        for p in range(f):
            for q in range(f):
                k = f * dx + p - q - f + 1
                if 0 <= k <= 2:
                    w2 = w2.at[:, dx, p, :, q, :].set(w[:, k])
    return w2.reshape(9 * f * c, f * co)


def _fold_x(x: jax.Array, f: int, wfp: int) -> jax.Array:
    """Pad (1,1) rows / (f, f + align) cols, fold width → [N, H+2, WFP, fC]."""
    n, h, w, c = x.shape
    wf = w // f
    right = f + f * (wfp - (wf + 2))
    xp = jnp.pad(x, ((0, 0), (1, 1), (f, right), (0, 0)))
    return xp.reshape(n, h + 2, wfp, f * c)


def _fold_g(g: jax.Array, f: int) -> jax.Array:
    n, h, w, co = g.shape
    return g.reshape(n, h, w // f, f * co)


# ---------------------------------------------------------------- kernels


def _fwd_kernel(x_hbm, w_ref, out_ref, xwin, sems, *, th, wf, cc, cco):
    """One [TH, WF, CCo] output row-block per grid step, double-buffered.

    The 9 taps are consumed as 9 accumulated K=CC GEMMs instead of one
    concatenated im2col GEMM: the dy slices are leading-dim register
    slices (free) and only the 3 dx shifts pay a sublane relayout, so
    the VPU does ~3 window copies per step instead of ~18.
    """
    n = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    linear = n * n_i + i

    def dma(slot, lin):
        nn = lin // n_i
        ii = lin % n_i
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(ii * th, th + 2)], xwin.at[slot], sems.at[slot]
        )

    @pl.when(linear == 0)
    def _():
        dma(0, 0).start()

    total = pl.num_programs(0) * n_i

    @pl.when(linear + 1 < total)
    def _():
        dma((linear + 1) % 2, linear + 1).start()

    dma(linear % 2, linear).wait()
    v = xwin[linear % 2]  # value [TH+2, WFP, CC]

    acc = jnp.zeros((th * wf, cco), jnp.float32)
    for dx in range(3):
        sh = v[:, dx : dx + wf, :]  # one sublane relayout per dx
        for dy in range(3):
            piece = sh[dy : dy + th].reshape(th * wf, cc)  # free row slice
            acc += jnp.dot(piece, w_ref[3 * dy + dx],
                           preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, wf, cco).astype(out_ref.dtype)


def _wgrad_kernel(x_hbm, g_ref, out_ref, xwin, sems, *, th, wf, cc, cco):
    """Accumulate one dy row-band of patchesᵀ·g; grid (3, N, H/TH).

    dy comes from the grid (bounding the f32 accumulator block to
    [3·CC, CCo]); it is selected with statically-unrolled pl.when
    branches because Mosaic has no dynamic_slice on values.
    """
    d = pl.program_id(0)
    n = pl.program_id(1)
    i = pl.program_id(2)
    n_n = pl.num_programs(1)
    n_i = pl.num_programs(2)
    linear = (d * n_n + n) * n_i + i

    def dma(slot, lin):
        rem = lin % (n_n * n_i)
        nn = rem // n_i
        ii = rem % n_i
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(ii * th, th + 2)], xwin.at[slot], sems.at[slot]
        )

    @pl.when(linear == 0)
    def _():
        dma(0, 0).start()

    total = 3 * n_n * n_i

    @pl.when(linear + 1 < total)
    def _():
        dma((linear + 1) % 2, linear + 1).start()

    @pl.when((n == 0) & (i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dma(linear % 2, linear).wait()
    v = xwin[linear % 2]  # [TH+2, WFP, CC]
    g = g_ref[0].reshape(th * wf, cco)  # [M, CCo]

    for dy in range(3):
        @pl.when(d == dy)
        def _(dy=dy):
            for dx in range(3):
                piece = v[dy : dy + th, dx : dx + wf, :].reshape(th * wf, cc)
                out_ref[dx * cc : (dx + 1) * cc] += jax.lax.dot_general(
                    piece, g.astype(piece.dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


# ------------------------------------------------------------- dispatch


def _conv3x3_call(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    n, h, width, ci = x.shape
    co = w.shape[-1]
    geo = _geometry(x.shape, co, x.dtype)
    if geo is None:
        raise ValueError(
            f"conv3x3 unsupported for x.shape={x.shape}, co={co}, "
            f"dtype={x.dtype}: no width fold / tile height fits the VMEM "
            "budget (check supported() before calling, or use lax.conv)")
    f, th, wf, wfp, cc, cco = geo
    xf = _fold_x(x, f, wfp)
    wff = _fold_weights(w, f).astype(x.dtype).reshape(9, cc, cco)
    kernel = functools.partial(_fwd_kernel, th=th, wf=wf, cc=cc, cco=cco)
    out = pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cc, cco), lambda nn, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wf, cco), lambda nn, ii: (nn, ii, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wf, cco), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wfp, cc), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xf, wff)
    return out.reshape(n, h, width, co)


def _wgrad_call(x: jax.Array, g: jax.Array, interpret: bool = False) -> jax.Array:
    n, h, width, ci = x.shape
    co = g.shape[-1]
    geo = _geometry(x.shape, co, x.dtype)
    if geo is None:
        raise ValueError(
            f"conv3x3 wgrad unsupported for x.shape={x.shape}, co={co}, "
            f"dtype={x.dtype} (check supported() before calling)")
    f, th, wf, wfp, cc, cco = geo
    xf = _fold_x(x, f, wfp)
    gf = _fold_g(g, f)
    kernel = functools.partial(_wgrad_kernel, th=th, wf=wf, cc=cc, cco=cco)
    dwf = pl.pallas_call(
        kernel,
        grid=(3, n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, wf, cco), lambda d, nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * cc, cco), lambda d, nn, ii: (d, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cc, cco), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wfp, cc), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xf, gf)
    # Pull the folded weight grad back through the (linear) fold.
    fold = lambda ww: _fold_weights(ww, f)
    (dw,) = jax.linear_transpose(
        fold, jax.ShapeDtypeStruct((3, 3, ci, co), dwf.dtype)
    )(dwf)
    return dw


def _flip_t(w: jax.Array) -> jax.Array:
    """Spatial flip + ci↔co transpose: the dgrad weights."""
    return jnp.transpose(jnp.flip(w, axis=(0, 1)), (0, 1, 3, 2))


# --------------------------------------------------- differentiable ops
#
# conv3x3 and wgrad3x3 are registered as first-class JAX *primitives*
# with per-argument JVP rules and transpose rules referencing each other
# — the same mechanism that makes ``lax.conv`` differentiable to
# arbitrary order.  (``custom_vjp`` is insufficient here: the R1 / PL
# grad-of-grad linearises the inner backward, and JAX's fallback JVP of
# a raw ``pallas_call`` cannot handle kernels with scratch/DMA.)

from jax.extend.core import Primitive
from jax.interpreters import ad, mlir
from jax._src import dispatch as _dispatch

conv3x3_p = Primitive("gantrack_conv3x3")
wgrad3x3_p = Primitive("gantrack_conv3x3_wgrad")


def conv3x3(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """Correlate NHWC ``x`` with HWIO 3×3 ``w``, stride 1, SAME zero pad.

    Drop-in for ``lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)),
    NHWC/HWIO)`` on supported shapes (see :func:`supported`), returning
    ``x.dtype`` with float32 MXU accumulation.
    """
    return conv3x3_p.bind(x, w.astype(x.dtype), interpret=bool(interpret))


def wgrad3x3(x: jax.Array, g: jax.Array, interpret: bool = False) -> jax.Array:
    """Weight gradient: ``dw[dy,dx,ci,co] = Σ xpad[·,y+dy,x+dx,ci]·g[·,y,x,co]``."""
    return wgrad3x3_p.bind(x, g.astype(x.dtype), interpret=bool(interpret))


def _conv_abstract(x, w, *, interpret):
    assert x.shape[-1] == w.shape[-2], (x.shape, w.shape)
    return jax.core.ShapedArray((*x.shape[:3], w.shape[-1]), x.dtype)


def _wgrad_abstract(x, g, *, interpret):
    assert x.shape[:3] == g.shape[:3], (x.shape, g.shape)
    return jax.core.ShapedArray((3, 3, x.shape[-1], g.shape[-1]), x.dtype)


conv3x3_p.def_abstract_eval(_conv_abstract)
wgrad3x3_p.def_abstract_eval(_wgrad_abstract)
conv3x3_p.def_impl(functools.partial(_dispatch.apply_primitive, conv3x3_p))
wgrad3x3_p.def_impl(functools.partial(_dispatch.apply_primitive, wgrad3x3_p))
mlir.register_lowering(
    conv3x3_p,
    mlir.lower_fun(
        lambda x, w, interpret: _conv3x3_call(x, w, interpret), multiple_results=False
    ),
)
mlir.register_lowering(
    wgrad3x3_p,
    mlir.lower_fun(
        lambda x, g, interpret: _wgrad_call(x, g, interpret).astype(x.dtype),
        multiple_results=False,
    ),
)

# Bilinear JVPs — tangents re-enter the same primitives.
ad.defjvp(
    conv3x3_p,
    lambda dx, x, w, *, interpret: conv3x3_p.bind(
        dx.astype(x.dtype), w, interpret=interpret),
    lambda dw, x, w, *, interpret: conv3x3_p.bind(
        x, dw.astype(x.dtype), interpret=interpret),
)
ad.defjvp(
    wgrad3x3_p,
    lambda dx, x, g, *, interpret: wgrad3x3_p.bind(
        dx.astype(x.dtype), g, interpret=interpret),
    lambda dg, x, g, *, interpret: wgrad3x3_p.bind(
        x, dg.astype(x.dtype), interpret=interpret),
)


def _conv_transpose(ct, x, w, *, interpret):
    if ad.is_undefined_primal(x):
        return conv3x3_p.bind(ct, _flip_t(w), interpret=interpret), None
    return None, wgrad3x3_p.bind(x, ct.astype(x.aval.dtype), interpret=interpret)


def _wgrad_transpose(ct, x, g, *, interpret):
    # wgrad(x, g) = Σ patches(x)·g; transpose wrt x scatters ct back
    # through the conv adjoint, wrt g it is the forward conv with ct.
    if ad.is_undefined_primal(x):
        return conv3x3_p.bind(g, _flip_t(ct).astype(g.aval.dtype),
                              interpret=interpret), None
    return None, conv3x3_p.bind(x, ct.astype(x.dtype), interpret=interpret)


ad.primitive_transposes[conv3x3_p] = _conv_transpose
ad.primitive_transposes[wgrad3x3_p] = _wgrad_transpose
