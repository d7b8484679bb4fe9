"""Microbench: augment pipeline fwd / fwd+bwd across warp tile variants.

Monkeypatches the TR/TC module constants of ops.pallas.warp + upwarp
before pipe construction (trace-time globals) to compare tile shapes at
the SG2-ADA 256² recipe. Per-call dispatch ~33 ms on this runtime, so a
K-step serialized chain is timed per variant.
"""
import sys
sys.path.insert(0, "/root/repo")

import time

import numpy as np
import jax
import jax.numpy as jnp

K = 8
RES, BATCH = 256, 32


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # drain
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / K * 1000)
    return min(ts)


def run_variant(tr, tc):
    import gantrack_tpu.ops.pallas.warp as warp
    import gantrack_tpu.ops.pallas.upwarp as upwarp

    warp.TR, warp.TC = tr, tc
    upwarp.TR, upwarp.TC = tr, tc
    from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config

    pipe = AugmentPipe(medical_augment_config(), RES, RES, 1, impl="pallas")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, RES, RES, 1)), jnp.float32)
    k0 = jax.random.PRNGKey(0)

    def chain(x):
        def body(c, i):
            y = pipe(c, jnp.asarray(0.6), jax.random.fold_in(k0, i))
            return y * 0.999, 0.0
        c, _ = jax.lax.scan(body, x, jnp.arange(K))
        return c

    fwd = jax.jit(chain)
    bwd = jax.jit(jax.grad(lambda x: jnp.sum(chain(x).astype(jnp.float32) ** 2)))
    t_f = timeit(fwd, x)
    t_b = timeit(bwd, x)
    print(f"TR={tr:3d} TC={tc:3d}: fwd {t_f:7.2f} ms/call  fwd+bwd {t_b:7.2f} ms/call",
          flush=True)


if __name__ == "__main__":
    variants = [(16, 128), (32, 128), (8, 128), (16, 256)]
    if len(sys.argv) > 1:
        variants = [tuple(int(v) for v in a.split("x")) for a in sys.argv[1:]]
    for tr, tc in variants:
        try:
            run_variant(tr, tc)
        except Exception as e:
            print(f"TR={tr} TC={tc}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
