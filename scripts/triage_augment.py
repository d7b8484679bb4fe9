"""Break down the ADA augment pipeline cost at 256², batch 32, C=1."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gantrack_tpu.ops.grid_sample import grid_sample
from gantrack_tpu.ops.upfirdn2d import downsample2d, setup_filter, upsample2d
from gantrack_tpu.training.augment import WAVELETS, AugmentPipe, medical_augment_config


def bench(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt*1000:8.1f} ms")


def main():
    res, batch = 256, 32
    hz = setup_filter(WAVELETS["sym6"])
    aug = AugmentPipe(medical_augment_config(), res, res, 1)
    mx0, mx1, my0, my1 = aug.margin
    print("margin:", aug.margin)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((batch, res, res, 1)), jnp.float32)

    pad = jax.jit(lambda x: jnp.pad(x, ((0, 0), (my0, my1), (mx0, mx1), (0, 0)), mode="reflect"))
    bench("reflect pad", pad, x)
    xp = pad(x)
    print("padded:", xp.shape)

    up = jax.jit(lambda x: upsample2d(x, hz, up=2))
    bench("upsample2d (sym6, C=1)", up, xp)
    xu = up(xp)
    print("upsampled:", xu.shape)

    hz_pad = hz.shape[0] // 4
    out_h = (res + hz_pad * 2) * 2
    grid = jnp.zeros((batch, out_h, out_h, 2))
    gs = jax.jit(grid_sample)
    bench("grid_sample (gather)", gs, xu, grid)

    xg = gs(xu, grid)
    down = jax.jit(lambda x: downsample2d(x, hz, down=2, padding=-hz_pad * 2, flip_filter=True))
    bench("downsample2d", down, xg)

    # batch-folded depthwise variant
    def up_folded(x):
        n, h, w, c = x.shape
        xf = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w, n * c)
        y = upsample2d(xf, hz, up=2)
        return jnp.transpose(y.reshape(y.shape[1], y.shape[2], n, c), (2, 0, 1, 3))

    bench("upsample2d batch-folded", jax.jit(up_folded), xp)

    full = jax.jit(lambda x, k: aug(x, jnp.asarray(0.5), k))
    bench("full augment", full, x, jax.random.PRNGKey(0))


if __name__ == "__main__":
    main()
