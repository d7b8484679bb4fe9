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
``[N, H, W, 3]`` (0..255 float), bilinear-resized to 299², scaled to
[-1, 1]; output ``[N, 2048]`` pool features.
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


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=[(2, 2), (2, 2)], name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
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
        bp = nn.avg_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
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
    """FID variant: the pool branch uses *average* pooling in both E
    blocks of the FID network (the torchvision final block uses max —
    community FID ports patch it back to avg)."""

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
        bp = nn.avg_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Full FID feature extractor: images (0..255, NHWC, 3ch) → [N, 2048]."""

    resize_to: int = 299

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == 3, "detector expects 3-channel input"
        x = jax.image.resize(
            x, (x.shape[0], self.resize_to, self.resize_to, 3), method="bilinear"
        )
        x = x / 127.5 - 1.0
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=[(1, 1), (1, 1)], name="Conv2d_2b_3x3")(x)
        x = _pool(x, 3, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool → [N, 2048]
        return x


def random_params(rng: jax.Array, resize_to: int = 299) -> Dict:
    """Seeded random detector parameters (fallback when no pretrained
    weights are available — see module docstring)."""
    model = InceptionV3Features(resize_to=resize_to)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return model.init(rng, dummy)


def load_npz(path: str) -> Dict:
    """Load converted detector weights (see tools/convert_detector.py)."""
    import flax

    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return {"params": flax.traverse_util.unflatten_dict(flat)}
