"""A/B: Pallas depthwise FIR kernel (attic) vs XLA depthwise-conv lowering.

RESULT (2026-08-18, v5e): the kernel LOST — up2 ran at 68 GB/s vs XLA's
264 GB/s on G-post-up 256²×64 (8.0 vs 2.1 ms), and the same/down2 halo
windows hit Mosaic "Low padding not supported yet" for pl.Element specs.
The kernel is parked in ops/attic/fir.py; XLA's depthwise conv stands.

Covers the SG2-ADA 256^2 recipe's hot FIR shapes (see
docs/evidence/mxu_floor.md: ~25 ms/step of HBM-bound FIR passes at
~490 GB/s through XLA).  Chained iterations inside one jit with a
consuming carry (jnp.mean) defeat both the 33 ms dispatch floor and
XLA slicing the op away.

usage: python scripts/bench_pallas_fir.py [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, x, iters=64, windows=5):
    @jax.jit
    def chain(x):
        def body(carry, _):
            s, xx = carry
            y = fn(xx * (1.0 + 1e-6 * s))  # scale defeats hoisting
            return (s + jnp.mean(y.astype(jnp.float32)), xx), None

        (s, _), _ = jax.lax.scan(body, (jnp.float32(0), x), None, length=iters)
        return s

    float(chain(x))  # compile + run
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        float(chain(x))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts) * 1000)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from gantrack_tpu.ops.attic.fir import fir2d
    from gantrack_tpu.ops.upfirdn2d import setup_filter, upfirdn2d

    f1 = [1.0, 3.0, 3.0, 1.0]
    f2 = jnp.asarray(np.outer(f1, f1) / 64.0, jnp.float32)
    taps = tuple(np.asarray(f1) / 8.0)

    cases = [
        # (label, shape, up, down, padding(y0,y1,x0,x1), gain)
        ("G-post-up  256^2 x64", (32, 259, 259, 64), 1, 1, (0, 0, 0, 0), 4.0),
        ("D-conv1    256^2 x64", (32, 256, 256, 64), 1, 1, (2, 2, 2, 2), 1.0),
        ("D-skip dn2 256^2 x64", (32, 256, 256, 64), 1, 2, (1, 1, 1, 1), 1.0),
        ("G-post-up  128^2 x128", (32, 131, 131, 128), 1, 1, (0, 0, 0, 0), 4.0),
        ("D-conv1    128^2 x128", (32, 128, 128, 128), 1, 1, (2, 2, 2, 2), 1.0),
        ("D-skip dn2 128^2 x128", (32, 128, 128, 128), 1, 2, (1, 1, 1, 1), 1.0),
        ("D-conv1     64^2 x256", (32, 64, 64, 256), 1, 1, (2, 2, 2, 2), 1.0),
        ("up2 (bwd)  128^2 x64", (32, 128, 128, 64), 2, 1, (2, 1, 2, 1), 4.0),
    ]
    print(f"{'case':24} {'xla ms':>8} {'pallas ms':>10} {'GB/s xla':>9} {'GB/s pl':>8}")
    for label, shape, up, down, pad, gain in cases:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        py0, py1, px0, px1 = pad

        def xla_fn(v):
            return upfirdn2d(v, f2, up=up, down=down,
                             padding=[px0, px1, py0, py1], gain=gain,
                             impl="conv")

        def pl_fn(v):
            return fir2d(v, taps, taps, up=up, down=down, padding=pad,
                         gain=gain)

        y = xla_fn(x)
        yp = pl_fn(x)
        assert y.shape == yp.shape, (label, y.shape, yp.shape)
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - yp.astype(jnp.float32))))
        bytes_moved = (x.size + y.size) * x.dtype.itemsize
        t_x = timed(xla_fn, x, iters)
        t_p = timed(pl_fn, x, iters)
        print(f"{label:24} {t_x:8.3f} {t_p:10.3f} "
              f"{bytes_moved/t_x/1e6:9.0f} {bytes_moved/t_p/1e6:8.0f}  maxerr={err:.2e}")


if __name__ == "__main__":
    main()
