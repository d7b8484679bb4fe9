"""Is AugmentPipe itself batch-size invariant under global_sample keying?

Applies the pipe to one batch of 8 vs four chunks of 2 with the same key
and global sample indices, in f64, and reports per-section divergence by
toggling config sections on one at a time.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import dataclasses

import jax.numpy as jnp
import numpy as np

from gantrack_tpu.training.augment import (
    AugmentConfig, AugmentPipe, medical_augment_config,
)

RES = 16
F64 = jnp.float64


def check(cfg, tag):
    pipe = AugmentPipe(cfg, RES, RES, 1, impl="gather", compute_dtype=F64)
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, RES, RES, 1)))
    key = jax.random.PRNGKey(42)
    p = jnp.asarray(0.7, F64)
    full = pipe(img, p, key, sample_idx=jnp.arange(8))
    parts = [
        pipe(img[i * 2:(i + 1) * 2], p, key,
             sample_idx=jnp.arange(i * 2, i * 2 + 2))
        for i in range(4)
    ]
    chunked = jnp.concatenate(parts, axis=0)
    err = float(jnp.max(jnp.abs(full - chunked)))
    print(f"{tag:28s}: max_abs_err={err:.3e} {'OK' if err < 1e-12 else 'FAIL'}")
    return err


if __name__ == "__main__":
    base = medical_augment_config()
    print("full medical config:")
    check(base, "ALL")
    # one section at a time
    zeros = {f.name: 0.0 for f in dataclasses.fields(AugmentConfig)
             if f.type in ("float",) and isinstance(getattr(base, f.name), float)}
    for section in ("xflip", "rotate90", "xint", "scale", "rotate", "aniso",
                    "xfrac", "brightness", "contrast", "lumaflip", "hue",
                    "saturation", "imgfilter", "noise", "cutout"):
        if getattr(base, section, 0) == 0:
            continue
        cfg = dataclasses.replace(base, **{k: (1.0 if k == section else 0.0)
                                           for k in zeros if k in
                                           ("xflip", "rotate90", "xint", "scale",
                                            "rotate", "aniso", "xfrac",
                                            "brightness", "contrast", "lumaflip",
                                            "hue", "saturation", "imgfilter",
                                            "noise", "cutout")})
        check(cfg, section)
