"""Microbenchmark: Pallas implicit-GEMM conv3x3 vs XLA conv at SG2 hot shapes.

Per-call dispatch on this tunneled runtime costs ~33 ms, so each timing
jits a K-iteration lax.scan chain (x -> conv(x, w·s_i)) and divides; the
per-iteration weight scaling defeats loop-invariant hoisting.
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gantrack_tpu.ops.attic.conv3x3 import conv3x3, supported

K = 32


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def chain(conv, x, w, k=K):
    def body(c, s):
        y = conv(c, w * s)
        return y * jax.lax.rsqrt(jnp.float32(9 * x.shape[-1]).astype(y.dtype)), 0.0
    scales = (1.0 + jnp.arange(k) * 1e-6).astype(x.dtype)
    y, _ = jax.lax.scan(body, x, scales)
    return y


KG = 8


def grad_chain(conv, x, w):
    def loss(w_):
        y = chain(conv, x, w_, KG)
        return jnp.sum(y * y).astype(jnp.float32)
    return jax.grad(loss)(w)


def timeit(fn, *args, iters=7, warmup=2, k=K):
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(r.astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(r.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3 / k


def main():
    shapes = [
        (32, 256, 64, 64),
        (32, 128, 128, 128),
        (32, 64, 256, 256),
        (32, 32, 512, 512),
        (32, 16, 512, 512),
    ]
    dtype = jnp.bfloat16
    for (n, h, ci, co) in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, h, h, ci), dtype)
        w = jax.random.normal(key, (3, 3, ci, co), dtype) / float(np.sqrt(9 * ci))
        flops = 2 * n * h * h * 9 * ci * co
        sup = supported(x.shape, w.shape, dtype)

        f_xla = jax.jit(functools.partial(chain, xla_conv))
        t_xla = timeit(f_xla, x, w)
        tf = lambda t: flops / (t * 1e-3) / 1e12
        line = f"{n}x{h}^2 c{ci}: fwd xla {t_xla:6.2f} ms ({tf(t_xla):5.1f} TF/s)"
        if sup:
            try:
                f_pl = jax.jit(functools.partial(chain, conv3x3))
                t_pl = timeit(f_pl, x, w)
                line += f" | pallas {t_pl:6.2f} ms ({tf(t_pl):5.1f} TF/s) [{t_xla/t_pl:4.2f}x]"
                ref, got = f_xla(x, w), f_pl(x, w)
                err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
                line += f" err {err:.2e}"
            except Exception as e:
                line += f" | pallas FAIL {type(e).__name__}: {str(e)[:160]}"
        print(line)

        # fwd+bwd (dgrad + wgrad through the chain)
        g_xla = jax.jit(functools.partial(grad_chain, xla_conv))
        t_gxla = timeit(g_xla, x, w, k=KG)
        bflops = 3 * flops
        tfb = lambda t: bflops / (t * 1e-3) / 1e12
        line = f"  grad: xla {t_gxla:6.2f} ms ({tfb(t_gxla):5.1f} TF/s)"
        if sup:
            try:
                g_pl = jax.jit(functools.partial(grad_chain, conv3x3))
                t_gpl = timeit(g_pl, x, w, k=KG)
                line += f" | pallas {t_gpl:6.2f} ms ({tfb(t_gpl):5.1f} TF/s) [{t_gxla/t_gpl:4.2f}x]"
                ref, got = g_xla(x, w), g_pl(x, w)
                err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
                rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-8)
                line += f" relerr {rel:.2e}"
            except Exception as e:
                line += f" | pallas FAIL {type(e).__name__}: {str(e)[:160]}"
        print(line)


if __name__ == "__main__":
    main()
