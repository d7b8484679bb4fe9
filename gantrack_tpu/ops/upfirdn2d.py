"""Efficient 2D resampling: pad → zero-insert upsample → FIR filter → downsample.

Capability parity with the reference ``torch_utils/ops/upfirdn2d.py`` (see
``upfirdn2d.py:118-211`` for the op contract and ``:277-388`` for the
``filter2d/upsample2d/downsample2d`` padding rules), re-designed for TPU:

* The whole pipeline is **one** ``lax.conv_general_dilated`` call — XLA's
  ``lhs_dilation`` performs the zero-insert upsample, ``window_strides``
  performs the downsample, and (possibly negative) base padding performs
  pad/crop.  There is no materialised up-sampled intermediate, and XLA
  fuses surrounding elementwise work into the conv.
* Layout is NHWC (channels on the TPU lane dimension); the FIR filter is
  applied depthwise.  Separable filters use two rank-1 passes.
* Gradients (any order) come from JAX autodiff of the conv — the
  reference's hand-derived "swap up/down + flip filter" adjoint
  (``upfirdn2d.py:250-269``) is what XLA derives automatically.

Numerics contract (matches the reference ``_upfirdn2d_ref``):
  1. zero-insert upsample by ``up``; 2. zero-pad/crop by ``padding``
  (relative to the upsampled grid); 3. *convolve* (i.e. flipped
  cross-correlation unless ``flip_filter``) with ``f * gain**(f.ndim/2)``;
  4. keep every ``down``-th pixel.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntOrPair = Union[int, Sequence[int]]


def _parse_scaling(scaling: IntOrPair) -> Tuple[int, int]:
    if isinstance(scaling, (int, np.integer)):
        scaling = [int(scaling)] * 2
    sx, sy = (int(v) for v in scaling)
    assert sx >= 1 and sy >= 1, f"invalid scaling {scaling}"
    return sx, sy


def _parse_padding(padding: IntOrPair) -> Tuple[int, int, int, int]:
    if isinstance(padding, (int, np.integer)):
        padding = [int(padding)] * 2
    padding = [int(v) for v in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _get_filter_size(f: Optional[jax.Array]) -> Tuple[int, int]:
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1,
    separable: Optional[bool] = None,
) -> jnp.ndarray:
    """Prepare a FIR filter for :func:`upfirdn2d`.

    Mirrors the reference ``setup_filter`` (``upfirdn2d.py:70-116``):
    ``None``→identity impulse; 1-D inputs become separable iff >= 8 taps
    (else outer-product to 2-D); DC-normalise; optional flip; scale by
    ``gain ** (ndim / 2)``.  Returns float32.

    Computed in **numpy** on purpose: the result stays a *concrete*
    constant even when called inside a traced function (flax modules
    build their resample filter per call), which is what lets
    :func:`upfirdn2d` choose the banded-matmul MXU lowering.  A traced
    (jnp) computation here would yield a Tracer and silently force the
    depthwise-conv fallback everywhere in the networks.
    """
    if f is None:
        f = 1
    if isinstance(f, jax.core.Tracer):
        raise TypeError("setup_filter requires concrete taps, got a tracer")
    f = np.asarray(f, dtype=np.float64)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / np.sum(f)
    if flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f.astype(np.float32)


def _depthwise_conv(
    x: jax.Array,
    f2d: jax.Array,
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    lhs_dilation: Tuple[int, int],
) -> jax.Array:
    """Depthwise NHWC conv with an identical [fh, fw] filter per channel.

    TPU: channels ride the lane dimension (128 lanes).  For few-channel
    images (medical C=1/2) a plain depthwise conv wastes ~99% of the
    lanes, so the batch is folded into the channel axis first (the filter
    is channel-shared, making this exact) — ~8× faster at 256² C=1.
    """
    n, h, w, channels = x.shape
    fold = channels < 32 and n > 1
    if fold:
        x = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w, n * channels)
    lanes = x.shape[-1]
    # HWIO with I=1, O=lanes via feature_group_count=lanes.
    rhs = jnp.broadcast_to(f2d[:, :, None, None], (*f2d.shape, 1, lanes))
    out = jax.lax.conv_general_dilated(
        x,
        rhs.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=lanes,
        precision=jax.lax.Precision.HIGHEST,
    )
    if fold:
        oh, ow = out.shape[1], out.shape[2]
        out = jnp.transpose(out.reshape(oh, ow, n, channels), (2, 0, 1, 3))
    return out


def upfirdn2d(
    x: jax.Array,
    f: Optional[jax.Array],
    up: IntOrPair = 1,
    down: IntOrPair = 1,
    padding: IntOrPair = 0,
    flip_filter: bool = False,
    gain: float = 1,
    impl: str = "auto",
) -> jax.Array:
    """Pad, upsample, FIR-filter, and downsample a batch of NHWC images.

    Args:
        x: ``[N, H, W, C]`` input.
        f: float32 FIR filter ``[fh, fw]`` (non-separable), ``[taps]``
           (separable), or ``None`` (identity).
        up / down: integer scaling factor(s), int or ``[x, y]``.
        padding: int, ``[x, y]``, or ``[x0, x1, y0, y1]`` w.r.t. the
            upsampled image; negative values crop.
        flip_filter: False = convolution, True = correlation.
        gain: overall magnitude scaling.
        impl: "auto" picks the banded-matmul (MXU) lowering whenever the
            filter is a *concrete* separable (1-D or rank-1 2-D) array —
            true for every `setup_filter` product in the networks and the
            ADA pipeline; "conv"/"matrix" force a lowering (tests).

    Returns:
        ``[N, out_h, out_w, C]`` where
        ``out_h = (H*upy + pady0 + pady1 - fh) // downy + 1`` (same for w).
    """
    assert x.ndim == 4, f"expected NHWC, got shape {x.shape}"
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    upW = x.shape[2] * upx + padx0 + padx1
    upH = x.shape[1] * upy + pady0 + pady1
    assert upW >= f.shape[-1] and upH >= f.shape[0], (
        f"upsampled buffer {upH}x{upW} smaller than filter {tuple(f.shape)}"
    )

    # MXU lowering for *few-channel* images: lower statically-known
    # separable filters to banded matmuls (see ``_upfirdn2d_matrix``;
    # measured ~8 ms/step off the ADA geometric FIR at 256² C=1, where
    # the NHWC→planes reshape moves no data).  Gated to C<=4 because at
    # model widths (C=64..512) the plane transpose is a full relayout and
    # measurably *loses* to the conv form (268 vs 193 ms/step FF) — wide
    # FIRs adjacent to a dense conv are instead composed into its kernel
    # (``conv2d_resample``).
    if (impl == "matrix" or (impl == "auto" and x.shape[3] <= 4)) \
            and f.size > 1 and not isinstance(f, jax.core.Tracer):
        fc = np.asarray(f, np.float32)
        if fc.ndim == 1:
            taps = tuple(fc.tolist())
            taps_yx = (taps, taps)
        else:
            taps_yx = _rank1_taps(fc.tobytes(), fc.shape)
        if taps_yx is not None:
            return _upfirdn2d_matrix(
                x, taps_yx[0], taps_yx[1], (upx, upy), (downx, downy),
                (padx0, padx1, pady0, pady1), flip_filter, gain, 0.5)
    assert impl != "matrix", "matrix impl requires a concrete separable filter"

    # NOTE (measured, round 3): a Pallas NHWC stencil kernel for the
    # model-width resample FIRs (now ops/attic/fir.py) measured ~68 GB/s
    # vs ~264 GB/s for this conv lowering on the hot up2 shape, and its
    # same/down2 halo windows hit a Mosaic Element-low-padding limit —
    # XLA's depthwise conv stands as the production lowering here.
    # NOTE (measured, round 3): decomposing a rank-1 2-D filter into two
    # 1-D depthwise passes (half the taps) LOSES on TPU (FF step 185 →
    # 208 ms): the FIR is HBM-bandwidth-bound, and two passes cost two
    # full-tensor round-trips vs one for the single 2-D conv.  Keep one
    # pass for 2-D filters; 1-D (>=8-tap) filters keep the two-pass form
    # (4x fewer MACs there outweighs the extra pass at 12+ taps).
    fy = fx = None
    if f.ndim == 1:
        fy = fx = jnp.asarray(f)

    # Overall gain, then flip for true convolution (XLA conv is cross-corr).
    if fy is None:
        f = f * (gain ** (f.ndim / 2))
        f = jnp.asarray(f).astype(x.dtype)
        if not flip_filter:
            f = jnp.flip(f, axis=tuple(range(f.ndim)))
        # lhs_dilation produces (H-1)*up+1 samples; the reference
        # zero-insert keeps up-1 trailing zeros (H*up samples), so fold
        # them into the high padding for identical output geometry.
        return _depthwise_conv(
            x, f,
            strides=(downy, downx),
            padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
            lhs_dilation=(upy, upx),
        )
    # Separable: vertical pass then horizontal pass, each fused into one conv.
    ga = gain ** 0.5
    fy = (fy * ga).astype(x.dtype)
    fx = (fx * ga).astype(x.dtype)
    if not flip_filter:
        fy = jnp.flip(fy, axis=0)
        fx = jnp.flip(fx, axis=0)
    x = _depthwise_conv(
        x, fy[:, None],
        strides=(downy, 1),
        padding=((pady0, pady1 + upy - 1), (0, 0)),
        lhs_dilation=(upy, 1),
    )
    x = _depthwise_conv(
        x, fx[None, :],
        strides=(1, downx),
        padding=((0, 0), (padx0, padx1 + upx - 1)),
        lhs_dilation=(1, upx),
    )
    return x


def filter2d(
    x: jax.Array,
    f: Optional[jax.Array],
    padding: IntOrPair = 0,
    flip_filter: bool = False,
    gain: float = 1,
) -> jax.Array:
    """FIR-filter NHWC images, output shape-matched to input.

    Padding rule per reference ``filter2d`` (``upfirdn2d.py:277-310``).
    """
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(
    x: jax.Array,
    f: Optional[jax.Array],
    up: IntOrPair = 2,
    padding: IntOrPair = 0,
    flip_filter: bool = False,
    gain: float = 1,
) -> jax.Array:
    """Upsample NHWC images with the given FIR filter.

    Padding/gain rules per reference ``upsample2d`` (``upfirdn2d.py:313-349``):
    output-centred padding and ``gain * up_x * up_y`` DC compensation.
    """
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


@functools.lru_cache(maxsize=64)
def _fir1d_matrix(
    taps: Tuple[float, ...], n_out: int, n_in: int, up: int, down: int,
    p0: int, flip_filter: bool, gain_axis: float,
) -> np.ndarray:
    """Static banded ``[n_out, n_in]`` operator of one separable upfirdn
    axis pass: ``out[v] = Σ_k F[k] · u[v·down + k − p0]`` where ``u`` is
    the zero-inserted (×``up``) input and ``F`` the (possibly flipped)
    gain-scaled taps — exactly the cross-correlation the depthwise-conv
    lowering performs."""
    f = np.asarray(taps, np.float64) * gain_axis
    if not flip_filter:
        f = f[::-1]
    # Built in f64 and cast to the compute dtype at the use site: each
    # (v, m) cell is a single tap (k is unique), so the f32 cast there is
    # bit-identical to building in f32 — and the f64 invariance pin keeps
    # full-precision taps.
    d = np.zeros((n_out, n_in), np.float64)
    for v in range(n_out):
        for m in range(n_in):
            k = m * up - v * down + p0
            if 0 <= k < len(f):
                d[v, m] += f[k]
    return d


@functools.lru_cache(maxsize=16)
def _rank1_taps(
    fbytes: bytes, shape: Tuple[int, ...]
) -> Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]]:
    """(taps_y, taps_x) if the concrete 2-D filter is rank-1 (separable as
    an outer product, e.g. every ``setup_filter([1,3,3,1])``), else None."""
    f = np.frombuffer(fbytes, np.float32).reshape(shape).astype(np.float64)
    u, s, vt = np.linalg.svd(f)
    if s[0] == 0 or (len(s) > 1 and s[1] > 1e-6 * s[0]):
        return None
    ty = u[:, 0] * np.sqrt(s[0])
    tx = vt[0] * np.sqrt(s[0])
    # Fold the SVD's sign ambiguity into a canonical form (DC-positive
    # when possible) — only the outer product matters numerically.
    if ty.sum() < 0 and tx.sum() < 0:
        ty, tx = -ty, -tx
    return tuple(ty.tolist()), tuple(tx.tolist())


def _upfirdn2d_matrix(
    x: jax.Array,
    taps_y: Sequence[float],
    taps_x: Sequence[float],
    up: Tuple[int, int],
    down: Tuple[int, int],
    padding: Tuple[int, int, int, int],
    flip_filter: bool,
    gain: float,
    gain_split: float,
) -> jax.Array:
    """:func:`upfirdn2d` for a separable filter, lowered as two static
    banded matmuls ``out = Dy @ x @ Dxᵀ`` per ``[H, W]`` plane.

    Same numerics contract as the depthwise-conv lowering (tested equal).
    On TPU the banded matmuls run dense on the MXU, while the depthwise
    conv (``feature_group_count=C``) cannot use the MXU at all — the FIR
    resamples inside the networks' ``conv2d_resample`` and the ADA
    geometric pipeline are the measured ~20+ ms/step cost this removes.
    The adjoint is just the transposed matmuls, so the backward pays no
    relayout transposes either (another measured ~7 ms in the ADA FIR).

    ``gain_split`` is the per-axis exponent share of ``gain`` (0.5 when
    the caller's gain contract is overall, matching ``f.ndim``-based
    scaling in :func:`upfirdn2d`).
    """
    n, h, w, c = x.shape
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    out_h = (h * upy + py0 + py1 - len(taps_y)) // downy + 1
    out_w = (w * upx + px0 + px1 - len(taps_x)) // downx + 1
    assert out_h > 0 and out_w > 0, (x.shape, up, down, padding)
    ga = float(gain) ** gain_split
    dy = jnp.asarray(_fir1d_matrix(tuple(taps_y), out_h, h, upy, downy, py0,
                                   flip_filter, ga))
    dxt = jnp.asarray(_fir1d_matrix(tuple(taps_x), out_w, w, upx, downx, px0,
                                    flip_filter, ga)).T
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, h, w)
    # One bf16 MXU pass with f32 accumulation; pin precision so an ambient
    # ``default_matmul_precision('highest')`` context can't force a
    # multi-pass split (bf16 inputs are already exact).  f64 inputs (the
    # CPU x64 invariance pin) keep f64 accumulation: f32 accumulation is
    # tiled shape-dependently by XLA, which breaks 1-dev==N-dev equality
    # at f32 ulps.
    pet = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    rows = jax.lax.dot_general(
        planes, dy.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=pet,
        precision=jax.lax.Precision.DEFAULT,
    )  # [P, w, out_h]
    out = jax.lax.dot_general(
        rows.astype(x.dtype), dxt.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=pet,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(x.dtype)  # [P, out_h, out_w]
    return jnp.transpose(out.reshape(n, c, out_h, out_w), (0, 2, 3, 1))


def downsample2d_matrix(
    x: jax.Array,
    taps: Sequence[float],
    down: int = 2,
    padding: int = 0,
    flip_filter: bool = False,
    gain: float = 1,
) -> jax.Array:
    """:func:`downsample2d` with explicit separable taps via the banded
    matmul lowering (see :func:`_upfirdn2d_matrix`)."""
    assert x.ndim == 4, f"expected NHWC, got shape {x.shape}"
    fw = len(taps)
    px0, px1, py0, py1 = _parse_padding(padding)
    p = (
        px0 + (fw - down + 1) // 2,
        px1 + (fw - down) // 2,
        py0 + (fw - down + 1) // 2,
        py1 + (fw - down) // 2,
    )
    return _upfirdn2d_matrix(
        x, taps, taps, (1, 1), (down, down), p, flip_filter, gain, 0.5)


def downsample2d(
    x: jax.Array,
    f: Optional[jax.Array],
    down: IntOrPair = 2,
    padding: IntOrPair = 0,
    flip_filter: bool = False,
    gain: float = 1,
) -> jax.Array:
    """Downsample NHWC images with the given FIR filter.

    Padding rule per reference ``downsample2d`` (``upfirdn2d.py:352-388``).
    """
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
