"""Perceptual Path Length (reference ``metrics/perceptual_path_length.py:35-131``).

Samples pairs of latents, perturbs by ε=1e-4 along the interpolation
(slerp in z / lerp in w), measures the perceptual (VGG) distance of the
rendered pair scaled by 1/ε², and reports the filtered mean (values
outside [p1, p99] removed).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metric_utils import MetricOptions, to_detector_input


def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation (reference ``:20-29``)."""
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1, 1))
    c = b_n - d * a_n
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    return (a_n * jnp.cos(p) + c * jnp.sin(p)) * jnp.linalg.norm(a, axis=-1, keepdims=True)


def compute_ppl(
    opts: MetricOptions,
    num_samples: int = 50000,
    epsilon: float = 1e-4,
    space: str = "w",
    sampling: str = "end",
    crop: bool = False,
    batch_size: int = 32,
) -> float:
    assert space in ("z", "w") and sampling in ("full", "end")
    assert opts.generator is not None and opts.detector is not None

    def prep(img):
        # Traced: crop (reference PPLSampler:73-75), 0..255, 3-channel.
        if crop:
            cc = img.shape[1] // 8
            img = img[:, cc * 3 : cc * 7, cc * 2 : cc * 6]
        img = jnp.clip(img * 127.5 + 128, 0, 255)
        return to_detector_input(img, opts.mode_idx)

    # The whole pair — latents → images → detector features → distance —
    # runs in ONE jit; only [b] distances return to host (bouncing both
    # rendered images through host numpy costs ~100 ms/pair-batch on the
    # tunneled runtime).
    @jax.jit
    def pair_dists(z0, z1, t):
        if space == "z":
            img0 = opts.generator(slerp(z0, z1, t), None)
            img1 = opts.generator(slerp(z0, z1, t + epsilon), None)
        else:
            # lerp in w through synthesis only (reference PPLSampler:54-57:
            # w0/w1 = mapping(z0/z1); wt = lerp(w0, w1, t | t+eps)).
            w0 = opts.mapping(z0, None)
            w1 = opts.mapping(z1, None)
            tt = t[:, :, None] if w0.ndim == 3 else t
            img0 = opts.synthesis(w0 + (w1 - w0) * tt)
            img1 = opts.synthesis(w0 + (w1 - w0) * (tt + epsilon))
        f0 = opts.detector.device_features(prep(img0))
        f1 = opts.detector.device_features(prep(img1))
        return jnp.sum(jnp.square(f0 - f1), axis=-1) / epsilon**2

    if space == "w" and (opts.mapping is None or opts.synthesis is None):
        raise ValueError(
            "space='w' PPL requires MetricOptions.mapping and .synthesis "
            "(ws-capable generator); refusing to fall back to z-space "
            "silently"
        )

    rng = jax.random.PRNGKey(opts.seed)
    dists = []
    done = 0
    while done < num_samples:
        rng, k0, k1, kt = jax.random.split(rng, 4)
        b = min(batch_size, num_samples - done)
        z0 = jax.random.normal(k0, (b, opts.z_dim))
        z1 = jax.random.normal(k1, (b, opts.z_dim))
        t = (jax.random.uniform(kt, (b, 1)) if sampling == "full"
             else jnp.zeros((b, 1)))
        dists.append(np.asarray(pair_dists(z0, z1, t)))
        done += b

    dist = np.concatenate(dists)
    lo = np.percentile(dist, 1, method="lower")
    hi = np.percentile(dist, 99, method="higher")
    return float(np.extract(np.logical_and(dist >= lo, dist <= hi), dist).mean())
