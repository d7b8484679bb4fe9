"""InceptionV3 feature extractor (FID protocol) in Flax.

The reference fetches NVIDIA's TorchScript port of the TF-slim
``inception-2015-12-05`` network by URL
(``metrics/frechet_inception_distance.py:22``).  This module implements
the same architecture natively (NHWC, jit-friendly, BN folded into
inference scale/offset) so feature extraction runs as batched XLA
inference on TPU.

Weights: this environment is zero-egress, so pretrained weights must be
supplied by the user — ``tools/convert_detector.py`` converts a locally
provided torchvision/NVIDIA checkpoint into the ``.npz`` this module
loads.  Without weights, :func:`random_params` provides a seeded random
detector: FID/KID machinery runs end-to-end and relative comparisons
remain meaningful, but absolute values are not comparable to published
FID (documented in README).

Input protocol (matching the reference detector): uint8-range images
``[N, H, W, 3]`` (0..255 float), bilinear-resized to 299², affinely
scaled; output ``[N, 2048]`` pool features (or 1008-way logits).

Two graph variants:

* ``variant="torchvision"`` — torchvision ``inception_v3`` semantics
  (half-pixel antialiased resize, x/127.5−1, avg pools include padding).
* ``variant="tfslim"`` — the TF-slim ``inception-2015-12-05`` network the
  reference's FID actually uses (NVIDIA's TorchScript port of it,
  ``metrics/frechet_inception_distance.py:22``): TF1 *legacy* bilinear
  resize (asymmetric source grid ``src = dst·in/out``, no antialiasing,
  no half-pixel offset), normalisation ``(x−128)/128`` (the classic
  ``classify_image`` graph's Sub/Mul nodes), SAME-avg-pools that EXCLUDE
  padding from the divisor, and a MAX pool in the Mixed_7c pool branch
  (the well-known quirk of the 2015-12-05 graph; cf. pytorch-fid's
  FIDInception patches).  **This is the variant whose FID values are
  comparable to the reference/published numbers** — convert the
  ``pt_inception-2015-12-05`` weights with ``tools/convert_detector.py
  --arch inception-tfslim``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    """Conv (no bias) + folded inference BatchNorm + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        offset = self.param("bn_offset", nn.initializers.zeros, (self.features,))
        return jax.nn.relu(x * scale + offset)


def _pool(x, window, stride, padding="VALID", kind="max"):
    if kind == "max":
        return nn.max_pool(x, (window, window), (stride, stride), padding)
    return nn.avg_pool(x, (window, window), (stride, stride), padding)


def _same_avg_pool_3x3(x, tf_pool: bool):
    """3×3/1 SAME average pool; ``tf_pool`` excludes the zero padding from
    the divisor (TF SAME semantics — pytorch-fid's ``count_include_pad=
    False`` patch), else includes it (torchvision semantics)."""
    return nn.avg_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)],
                       count_include_pad=not tf_pool)


def _tf1_interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Interpolation matrix of TF1 ``ResizeBilinear`` with
    ``align_corners=False, half_pixel_centers=False``: source coordinate
    ``src = dst · (n_in/n_out)`` — the legacy asymmetric grid the frozen
    2015-12-05 graph uses (no antialiasing, even when downscaling)."""
    scale = n_in / n_out
    src = np.arange(n_out, dtype=np.float64) * scale
    x0 = np.floor(src).astype(np.int64)
    x1 = np.minimum(x0 + 1, n_in - 1)
    frac = (src - x0).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), x0] += 1.0 - frac
    m[np.arange(n_out), x1] += frac
    return m


def tf1_resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """[N, H, W, C] → [N, out_h, out_w, C] via two static matmuls (rides
    the MXU; exact TF1 legacy bilinear numerics)."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_tf1_interp_matrix(h, out_h))
    mw = jnp.asarray(_tf1_interp_matrix(w, out_w))
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    return jnp.einsum("ow,nhwc->nhoc", mw, x)


class InceptionA(nn.Module):
    pool_features: int
    tf_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=[(2, 2), (2, 2)], name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_3")(b3)
        bp = _same_avg_pool_3x3(x, self.tf_pool)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    tf_pool: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_5")(bd)
        bp = _same_avg_pool_3x3(x, self.tf_pool)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """Pool-branch behaviour differs per variant: torchvision uses
    include-padding avg pools; the TF-slim 2015-12-05 graph uses
    exclude-padding avg in Mixed_7b but a MAX pool in Mixed_7c (the
    known quirk of that frozen graph — pytorch-fid FIDInceptionE_2)."""

    tf_pool: bool = False
    pool_kind: str = "avg"   # "avg" | "max"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "max":
            bp = nn.max_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
        else:
            bp = _same_avg_pool_3x3(x, self.tf_pool)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Full FID feature extractor: images (0..255, NHWC, 3ch) → [N, 2048]
    (or [N, 1008] logits with ``return_logits``, for Inception Score)."""

    resize_to: int = 299
    variant: str = "torchvision"   # "torchvision" | "tfslim" (see module doc)
    return_logits: bool = False
    logits_bias: bool = True       # reference IS uses no_output_bias=True

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == 3, "detector expects 3-channel input"
        tf = self.variant == "tfslim"
        if tf:
            x = tf1_resize_bilinear(x, self.resize_to, self.resize_to)
            x = (x - 128.0) / 128.0
        else:
            x = jax.image.resize(
                x, (x.shape[0], self.resize_to, self.resize_to, 3),
                method="bilinear",
            )
            x = x / 127.5 - 1.0
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=[(1, 1), (1, 1)], name="Conv2d_2b_3x3")(x)
        x = _pool(x, 3, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _pool(x, 3, 2)
        x = InceptionA(32, tf_pool=tf, name="Mixed_5b")(x)
        x = InceptionA(64, tf_pool=tf, name="Mixed_5c")(x)
        x = InceptionA(64, tf_pool=tf, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, tf_pool=tf, name="Mixed_6b")(x)
        x = InceptionC(160, tf_pool=tf, name="Mixed_6c")(x)
        x = InceptionC(160, tf_pool=tf, name="Mixed_6d")(x)
        x = InceptionC(192, tf_pool=tf, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(tf_pool=tf, name="Mixed_7b")(x)
        x = InceptionE(tf_pool=tf, pool_kind="max" if tf else "avg",
                       name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool → [N, 2048]
        if self.return_logits:
            x = nn.Dense(1008, use_bias=self.logits_bias, name="output")(x)
        return x


def random_params(rng: jax.Array, resize_to: int = 299,
                  variant: str = "torchvision") -> Dict:
    """Seeded random detector parameters (fallback when no pretrained
    weights are available — see module docstring)."""
    model = InceptionV3Features(resize_to=resize_to, variant=variant)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return model.init(rng, dummy)


def load_npz(path: str) -> Tuple[Dict, str]:
    """Load converted detector weights (see tools/convert_detector.py).

    Returns ``(variables, variant)`` — the npz records which graph variant
    ("tfslim" = reference-comparable FID, "torchvision") the weights
    belong to; legacy npz files without the marker are torchvision."""
    import flax

    data = dict(np.load(path))
    variant = str(data.pop("__variant__")) if "__variant__" in data else "torchvision"
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return {"params": flax.traverse_util.unflatten_dict(flat)}, variant
