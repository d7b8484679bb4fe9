"""Style-modulated convolution — hot op #1 of StyleGAN2.

Capability parity with the reference ``training/networks_stylegan2.py:32-89``
(modulation, demodulation ``rsqrt(sum(w^2)+1e-8)``, unfused vs fused
execution, optional noise fma), re-designed for TPU:

* The **unfused** path ("scale activations before/after one shared-weight
  conv") is the default for both training and inference: TPU/XLA runs one
  large dense conv on the MXU and fuses the per-sample style/demod scaling
  into it.  Grouped-per-sample convolution (the reference's fused path,
  optimal on CUDA for inference) maps poorly to the MXU.
* The fused grouped path is still provided for API/numerics parity.
* The reference's fp16 overflow pre-normalisation (``:52-54``) is
  unnecessary under bfloat16 (same exponent range as fp32) and is omitted;
  demodulation statistics are always computed in float32.

Layout: ``x`` NHWC, ``weight`` HWIO, ``styles [N, I]``, ``noise [N,H,W,1]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .conv2d_resample import conv2d_resample

__all__ = ["modulated_conv2d"]


def modulated_conv2d(
    x: jax.Array,
    weight: jax.Array,
    styles: jax.Array,
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jax.Array] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
    fused_modconv: bool = False,
) -> jax.Array:
    """Apply a style-modulated (optionally demodulated, resampled) conv.

    Args:
        x: ``[N, H, W, I]`` activations.
        weight: ``[kh, kw, I, O]`` shared convolution weight.
        styles: ``[N, I]`` per-sample modulation from the affine layer.
        noise: optional ``[N, H', W', 1]`` (or broadcastable) additive noise.
        up/down/padding/resample_filter: see :func:`conv2d_resample`.
        demodulate: rescale outputs to unit expected variance.
        flip_weight: False = convolution, True = correlation.
        fused_modconv: use the grouped per-sample-weight formulation
            (numerically equivalent; kept for parity/testing).
    """
    batch = x.shape[0]
    kh, kw, in_ch, out_ch = weight.shape
    assert styles.shape == (batch, in_ch), (styles.shape, (batch, in_ch))

    dcoefs = None
    if demodulate or fused_modconv:
        # [N, kh, kw, I, O] virtual per-sample weights (float32 stats;
        # follow-operand so a float64 graph keeps f64 demod statistics).
        _hi = jnp.float64 if styles.dtype == jnp.float64 else jnp.float32
        w = weight[jnp.newaxis].astype(_hi) * styles[:, None, None, :, None].astype(_hi)
    if demodulate:
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(1, 2, 3)) + 1e-8)  # [N, O]

    if not fused_modconv:
        x = x * styles[:, None, None, :].astype(x.dtype)
        x = conv2d_resample(
            x, weight.astype(x.dtype), f=resample_filter,
            up=up, down=down, padding=padding, flip_weight=flip_weight,
        )
        if demodulate and noise is not None:
            x = x * dcoefs[:, None, None, :].astype(x.dtype) + noise.astype(x.dtype)
        elif demodulate:
            x = x * dcoefs[:, None, None, :].astype(x.dtype)
        elif noise is not None:
            x = x + noise.astype(x.dtype)
        return x

    # Fused grouped path: one conv with feature_group_count = batch, per-
    # sample weights.  Channel blocks are sample-major on both sides.
    if demodulate:
        w = w * dcoefs[:, None, None, None, :]
    w = w.astype(x.dtype)
    # [N,kh,kw,I,O] -> [kh,kw,I,N*O] with sample-major output channels.
    w = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(kh, kw, in_ch, batch * out_ch)
    h_in, w_in = x.shape[1], x.shape[2]
    # [N,H,W,I] -> [1,H,W,N*I], sample-major channel blocks.
    xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h_in, w_in, batch * in_ch)
    xg = conv2d_resample(
        xg, w, f=resample_filter, up=up, down=down, padding=padding,
        groups=batch, flip_weight=flip_weight,
    )
    h_out, w_out = xg.shape[1], xg.shape[2]
    x = jnp.transpose(xg.reshape(h_out, w_out, batch, out_ch), (2, 0, 1, 3))
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x
