"""Compile the actual bf16 warp/splat pallas kernels on the real TPU.

Isolates the 'Bad lhs type' Mosaic failure seen in the full train step.
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from gantrack_tpu.ops.pallas.warp import affine_warp

B, H, W = 4, 64, 64


def coeffs_for(theta=0.1):
    m = []
    for i in range(B):
        a = theta * (i + 1) / B
        m.append([[np.cos(a), -np.sin(a), 0.02], [np.sin(a), np.cos(a), -0.03]])
    return jnp.asarray(np.array(m, np.float32))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cf = coeffs_for()
    for dt in (jnp.float32, jnp.bfloat16):
        img = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, W, 1)), dt)
        if which in ("all", "fwd", "hi"):
            try:
                with jax.default_matmul_precision("highest" if which == "hi" else "default"):
                    out = jax.jit(lambda x: affine_warp(x, cf, H, W, window=(16, 16)))(img)
                print(f"fwd {dt.__name__}: OK sum={float(jnp.sum(out.astype(jnp.float32))):.3f}")
            except Exception as e:
                lines = [l for l in str(e).splitlines() if "Bad" in l or "Mosaic" in l or "error" in l.lower()]
                print(f"fwd {dt.__name__}: FAIL {lines[:2]}")
        if which in ("all", "bwd"):
            try:
                g = jax.jit(jax.grad(lambda x: jnp.sum(
                    affine_warp(x, cf, H, W, window=(16, 16)).astype(jnp.float32) ** 2)))(img)
                print(f"bwd {dt.__name__}: OK sum={float(jnp.sum(g.astype(jnp.float32))):.3f}")
            except Exception as e:
                lines = [l for l in str(e).splitlines() if "Bad" in l or "Mosaic" in l or "error" in l.lower()]
                print(f"bwd {dt.__name__}: FAIL {lines[:2]}")


if __name__ == "__main__":
    main()
