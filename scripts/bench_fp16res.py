"""A/B: FF train-step time at num_fp16_res=4 (recipe) vs 8 (full-bf16).

The by-block profile attributes ~43 ms/step to the f32 sub-b128 levels
(b64..b4 run f32 at half MXU rate under the reference's num_fp16_res=4);
bf16 keeps f32 exponent range, so the fp16 range concern that motivated
the reference's top-4 split does not apply on TPU.

usage: python scripts/bench_fp16res.py [variants...]  (default: 4 8)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax
jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp

from profile_step import build_stepper  # noqa: E402


def median_ms(fn, state, imgs, zeros_c, windows=5, steps=16):
    s = jax.tree.map(jnp.copy, state)
    s, _ = fn(s, imgs, zeros_c)
    np.asarray(s.pl_mean)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            s, _ = fn(s, imgs, zeros_c)
        np.asarray(s.pl_mean)
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times) * 1000)


def main():
    variants = [int(v) for v in (sys.argv[1:] or ["4", "8"])]
    for v in variants:
        stepper, state, imgs, zeros_c = build_stepper(num_fp16_res=v)
        t = median_ms(stepper.get(False, False), state, imgs, zeros_c)
        print(f"num_fp16_res={v}: FF step {t:.1f} ms "
              f"({32 / t * 1000:.1f} imgs/s plain)", flush=True)


if __name__ == "__main__":
    main()
