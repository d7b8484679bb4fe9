"""Measure the achievable MXU rate of the train step's dominant conv
shapes in isolation — the per-op-class ceiling that bounds step time.

Each case chains ITERS iterations inside one jit via lax.scan (per-iter
input scaling defeats CSE/hoisting; the 33 ms per-dispatch floor of the
tunneled runtime is amortised).  Reports ms/op and achieved TF/s vs the
~197 TF/s bf16 peak of one v5e chip.

usage: python scripts/bench_conv_ceiling.py [case ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp


ITERS = 96
WINDOWS = 4


def _conv(ci, co, hw, stride=1, batch=32, dtype=jnp.bfloat16):
    w = jnp.asarray(np.random.default_rng(0).standard_normal((3, 3, ci, co)),
                    dtype) * 0.01
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((batch, hw, hw, ci)),
                     dtype)

    def one(x):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    flops = 2 * batch * (hw // stride) ** 2 * 9 * ci * co
    return one, x0, flops


def _fwdbwd(ci, co, hw, batch=32, dtype=jnp.bfloat16):
    """Forward + dgrad + wgrad of one conv (3 conv-class ops); cotangent
    derived from the forward so no big constant is baked into the jit."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)), dtype) * 0.01
    x0 = jnp.asarray(rng.standard_normal((batch, hw, hw, ci)), dtype)

    def one(x):
        def f(xw):
            xx, ww = xw
            return jax.lax.conv_general_dilated(
                xx, ww, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y, vjp = jax.vjp(f, (x, w))
        gx, gw = vjp(y * 0.999)[0]
        return gx * (1 + jnp.mean(gw).astype(dtype) * 1e-9)

    flops = 3 * 2 * batch * hw * hw * 9 * ci * co
    return one, x0, flops


def _fir(ci, hw, taps=4, batch=32, dtype=jnp.bfloat16):
    f = jnp.asarray(np.random.default_rng(0).standard_normal((taps, 1, 1, ci)),
                    dtype) * 0.1

    def one(x):
        y = jax.lax.conv_general_dilated(
            x, f, (1, 1), ((taps // 2, taps - 1 - taps // 2), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ci)
        return y

    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((batch, hw, hw, ci)),
                     dtype)
    flops = 2 * batch * hw * hw * taps * ci
    return one, x0, flops


def _convup(ci, co, hw_in, batch=32, dtype=jnp.bfloat16):
    """G conv0 shape: 3x3 conv over a 2x lhs-dilated input (transposed
    conv).  FLOPs counted as the *algorithmic* count (zeros skipped);
    achieved-% far below the plain-conv ceiling ⇒ XLA computes the
    dilation zeros and a phase decomposition would win ~4x."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)), dtype) * 0.01
    x0 = jnp.asarray(rng.standard_normal((batch, hw_in, hw_in, ci)), dtype)

    def one(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # out is [2*hw_in, 2*hw_in]; each output pixel touches ceil(9/4)≈2.25
    # nonzero taps on average -> algorithmic flops = out_px * 9/4 * ci*co*2
    flops = 2 * batch * (2 * hw_in) ** 2 * 9 * ci * co // 4
    return one, x0, flops


CASES = {
    "convup_b256": lambda: _convup(128, 64, 128),     # G b256 conv0
    "convup_b128": lambda: _convup(256, 128, 64),
    "conv_b256": lambda: _conv(64, 64, 256),          # G/D b256 conv0
    "conv_b256_s2": lambda: _conv(64, 128, 256, 2),   # D b256 conv1
    "conv_b128": lambda: _conv(128, 128, 128),
    "conv_b64": lambda: _conv(256, 256, 64),
    "conv_b32": lambda: _conv(512, 512, 32),
    "conv_b256_pad128": lambda: _conv(128, 128, 256),  # lanes-full variant
    "fwdbwd_b256": lambda: _fwdbwd(64, 64, 256),
    "fwdbwd_b128": lambda: _fwdbwd(128, 128, 128),
    "fir_b256": lambda: _fir(64, 256),
    "conv_b256_f32": lambda: _conv(64, 64, 256, 1, 32, jnp.float32),
}


def bench(name):
    one, x0, flops = CASES[name]()

    @jax.jit
    def chain(x):
        # Scalar carry (handles shape-changing ops).  The carry MUST
        # consume a full reduction of the output: a single-element slice
        # lets XLA rewrite slice(conv) into a tiny dot and the "conv"
        # benchmarks the 33 ms dispatch floor instead (measured: every
        # shape came out ≈ 33ms/ITERS).
        def body(c, _):
            y = one(x * (1 + c).astype(x.dtype))
            return c + jnp.mean(y.astype(jnp.float32)) * 1e-12, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    np.asarray(chain(x0))  # compile+warm
    times = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        np.asarray(chain(x0))
        times.append((time.perf_counter() - t0) / ITERS)
    ms = float(np.median(times) * 1e3)
    tf = flops / (ms / 1e3) / 1e12
    print(f"{name:18s} {ms:8.3f} ms/op  {tf:7.1f} TF/s  ({tf / 197 * 100:4.1f}% peak)",
          flush=True)


def main():
    names = sys.argv[1:] or list(CASES)
    for n in names:
        bench(n)


if __name__ == "__main__":
    main()
