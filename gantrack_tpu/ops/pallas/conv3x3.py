"""Pallas TPU kernel: implicit-GEMM 3×3 stride-1 convolution (NHWC).

The SG2/SG3 hot path is dominated by dense 3×3 stride-1 convolutions
(G ``conv1`` of every block, D ``conv0``, and all their autodiff
transposes).  XLA lowers them to spatial conv fusions that run the
256²×64-channel family at ~6-13% of MXU peak on v5e — the 64-wide
channel dimension under-fills the 128-lane MXU and the compiler's conv
tiling cannot recover it (measured in round 1: space-to-depth and
XLA-level im2col are both slower; docs/ROADMAP.md).

This kernel reformulates the conv as an explicit GEMM **in VMEM**:

* grid ``(N, H/TH)``; each step DMAs one ``[TH+2, W+2, C]`` halo row
  window of the (pre-padded) input from HBM, double-buffered so the
  copy of block ``i+1`` overlaps the GEMM of block ``i``;
* the 9 shifted taps are concatenated lane-wise into an im2col patch
  matrix ``[TH·W, 9·Ci]`` that never exists in HBM (the round-1 XLA
  im2col failure mode was exactly its HBM materialisation);
* one MXU GEMM ``[TH·W, 9·Ci] × [9·Ci, Co]`` per step with float32
  accumulation.  K = 9·Ci amortises the 128-deep MXU passes; M is huge;
  N = Co is the only under-filled axis (50% at Co=64, 100% at ≥128).

Gradients close under the family: ``dx`` is this same kernel applied to
the cotangent with the spatially-flipped, ci↔co-transposed weights, and
``dw`` is an accumulating patchesᵀ·g kernel (``wgrad3x3``).  Both carry
their own ``custom_vjp`` whose rules reference each other, so the R1 /
path-length double-backward (grad-of-grad through D and G convs)
resolves entirely within these kernels at arbitrary order.

Replaces the CUDA-side efficiency role of the reference's plugin convs
(``torch_utils/ops/conv2d_gradfix.py``, ``conv2d_resample.py:46-141``);
numerics are the plain correlation contract of ``lax.conv`` (SAME, no
flip), verified against XLA in ``tests/test_conv3x3.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "wgrad3x3", "supported"]


def _pick_th(h: int) -> int:
    for th in (16, 8, 4):
        if h % th == 0:
            return th
    return 0


def supported(x_shape, w_shape, dtype) -> bool:
    """Shapes this kernel accepts (the SG2/SG3 3×3 stride-1 family)."""
    n, h, w, ci = x_shape
    kh, kw, wci, co = w_shape
    if (kh, kw) != (3, 3) or wci != ci:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if h != w or _pick_th(h) == 0 or h < 8:
        return False
    # Lane-aligned channels; wider shapes fall back to XLA.
    if ci % 64 != 0 or co % 64 != 0 or ci > 1024 or co > 1024:
        return False
    return True


# ---------------------------------------------------------------- kernels


def _fwd_kernel(x_hbm, w_ref, out_ref, xwin, sems, *, th, w, ci, co):
    """One [TH, W, Co] output row-block per grid step, double-buffered."""
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
    win = xwin[linear % 2]  # [TH+2, W+2, Ci]

    pieces = []
    for dy in range(3):
        for dx in range(3):
            pieces.append(win[dy : dy + th, dx : dx + w, :].reshape(th * w, ci))
    lhs = jnp.concatenate(pieces, axis=1)  # [TH*W, 9*Ci]
    acc = jnp.dot(lhs, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, w, co).astype(out_ref.dtype)


def _wgrad_kernel(x_hbm, g_ref, out_ref, xwin, sems, *, th, w, ci, co):
    """Accumulate patchesᵀ·g into the [9·Ci, Co] output across all steps."""
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
        out_ref[:] = jnp.zeros_like(out_ref)

    total = pl.num_programs(0) * n_i

    @pl.when(linear + 1 < total)
    def _():
        dma((linear + 1) % 2, linear + 1).start()

    dma(linear % 2, linear).wait()
    win = xwin[linear % 2]

    pieces = []
    for dy in range(3):
        for dx in range(3):
            pieces.append(win[dy : dy + th, dx : dx + w, :].reshape(th * w, ci))
    lhs = jnp.concatenate(pieces, axis=1)              # [M, 9*Ci]
    g = g_ref[0].reshape(th * w, co).astype(lhs.dtype)  # [M, Co]
    out_ref[:] += jax.lax.dot_general(
        lhs, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ------------------------------------------------------------- dispatch


def _conv3x3_call(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    n, h, width, ci = x.shape
    co = w.shape[-1]
    th = _pick_th(h)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * ci, co).astype(x.dtype)
    grid = (n, h // th)
    kernel = functools.partial(_fwd_kernel, th=th, w=width, ci=ci, co=co)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * ci, co), lambda nn, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, width, co), lambda nn, ii: (nn, ii, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, width, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, width + 2, ci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wf)


def _wgrad_call(x: jax.Array, g: jax.Array, interpret: bool = False) -> jax.Array:
    n, h, width, ci = x.shape
    co = g.shape[-1]
    th = _pick_th(h)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid = (n, h // th)
    kernel = functools.partial(_wgrad_kernel, th=th, w=width, ci=ci, co=co)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, width, co), lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * ci, co), lambda nn, ii: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, width + 2, ci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, g)
    return out.reshape(3, 3, ci, co)


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
