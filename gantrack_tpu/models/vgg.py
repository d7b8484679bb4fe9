"""VGG16 feature extractor in Flax — used by precision/recall, PPL, and
the latent projector's LPIPS-style perceptual loss.

The reference fetches NVIDIA's ``vgg16.pkl`` (4096-d fc features for
PR/PPL) and a TorchScript LPIPS-VGG by URL; as with InceptionV3,
pretrained weights must be provided locally (tools/convert_detector.py)
— :func:`random_params` gives a seeded random fallback.

Input protocol: images 0..255 NHWC 3ch; ``features`` returns the 4096-d
fc2 embedding (PR/PPL detector contract); ``lpips_taps`` returns the 5
conv-block activations used for perceptual distance.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16(nn.Module):
    resize_to: int = 224

    @nn.compact
    def __call__(self, x, return_taps: bool = False):
        assert x.shape[-1] == 3
        x = jax.image.resize(
            x, (x.shape[0], self.resize_to, self.resize_to, 3), method="bilinear"
        )
        # Caffe-style preprocessing of the NVIDIA port: BGR mean subtract.
        mean = jnp.asarray([123.68, 116.779, 103.939])
        x = x - mean
        taps: List[jax.Array] = []
        i = 0
        block = 1
        conv_idx = 1
        for v in _CFG:
            if v == "M":
                taps.append(x)
                x = nn.max_pool(x, (2, 2), (2, 2))
                block += 1
                conv_idx = 1
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv{block}_{conv_idx}")(x)
                x = jax.nn.relu(x)
                conv_idx += 1
            i += 1
        if return_taps:
            return taps
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(nn.Dense(4096, name="fc1")(x))
        x = jax.nn.relu(nn.Dense(4096, name="fc2")(x))
        return x


def lpips_features(model: "VGG16", variables: Dict, img255: jax.Array) -> jax.Array:
    """LPIPS embedding: unit-normalised conv-block activations, flattened.

    Mirrors the contract of the reference's ``vgg16(x, return_lpips=True)``
    (NVIDIA ``vgg16.pt``; used by ``projector.py:171-180,231-247``): the
    squared L2 distance between two embeddings is the perceptual distance.
    Activations are channel-unit-normalised per pixel and scaled by
    1/√(H·W) so each block contributes its spatial-mean squared error.
    """
    taps = model.apply(variables, img255, return_taps=True)
    feats = []
    for t in taps:
        norm = jnp.sqrt(jnp.sum(jnp.square(t), axis=-1, keepdims=True) + 1e-10)
        t = t / norm
        n, h, w, c = t.shape
        feats.append((t / np.sqrt(h * w)).reshape(n, -1))
    return jnp.concatenate(feats, axis=1)


def random_params(rng: jax.Array, resize_to: int = 224) -> Dict:
    model = VGG16(resize_to=resize_to)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return model.init(rng, dummy)


def load_npz(path: str) -> Dict:
    import flax

    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return {"params": flax.traverse_util.unflatten_dict(flat)}
