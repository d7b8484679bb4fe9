"""Compile the bf16 AugmentPipe on the real TPU at given resolutions.

Reproduces the 'Bad lhs type' Mosaic failure from the verify train run.
Usage: python scripts/probe_augment_bf16.py [res ...]
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config


def main():
    rss = [int(a) for a in sys.argv[1:]] or [32, 256]
    for res in rss:
        for dt in ("bfloat16", "float32"):
            pipe = AugmentPipe(medical_augment_config(), res, res, 1,
                               compute_dtype=jnp.dtype(dt))
            x = jnp.asarray(np.random.default_rng(0).standard_normal((4, res, res, 1)),
                            jnp.float32)
            try:
                y = jax.jit(lambda x: pipe(x, jnp.asarray(0.5), jax.random.PRNGKey(0)))(x)
                print(f"res {res} {dt}: OK sum={float(jnp.sum(y)):.3f}")
            except Exception as e:
                lines = [l for l in str(e).splitlines()
                         if "Bad" in l or "Mosaic" in l or "tpu.matmul" in l]
                print(f"res {res} {dt}: FAIL {lines[:3]}")


if __name__ == "__main__":
    main()
