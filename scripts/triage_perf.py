"""Per-component timing triage at the bench config (256², batch 32)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gantrack_tpu.models.stylegan2 import Discriminator, Generator
from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config


def bench(name, fn, *args, n=8):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1000:8.1f} ms")
    return dt


def main():
    res, batch, zdim = 256, 32, 512
    g = Generator(
        z_dim=zdim, c_dim=0, w_dim=zdim, img_resolution=res, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512, num_fp16_res=4),
    )
    d = Discriminator(
        c_dim=0, img_resolution=res, img_channels=1,
        channel_base=16384, channel_max=512, num_fp16_res=4,
        epilogue_kwargs=dict(mbstd_group_size=4),
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, zdim))
    gv = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(2)}, z, None)
    img = jnp.asarray(np.random.default_rng(0).standard_normal((batch, res, res, 1)), jnp.float32)
    dv = d.init(jax.random.PRNGKey(0), img)
    aug = AugmentPipe(medical_augment_config(), res, res, 1)

    g_fwd = jax.jit(lambda v, z, k: g.apply(v, z, None, rngs={"noise": k}))
    d_fwd = jax.jit(lambda v, x: d.apply(v, x))
    aug_fwd = jax.jit(lambda x, p, k: aug(x, p, k))

    k = jax.random.PRNGKey(3)
    bench("G forward", g_fwd, gv, z, k)
    bench("D forward", d_fwd, dv, img)
    bench("augment forward", aug_fwd, img, jnp.asarray(0.5), k)

    def g_loss(params, z, k):
        out = g.apply({"params": params, **{c: gv[c] for c in gv if c != "params"}},
                      z, None, rngs={"noise": k})
        return jnp.sum(out * out)

    g_bwd = jax.jit(lambda p, z, k: jax.grad(g_loss)(p, z, k))
    bench("G fwd+bwd", g_bwd, gv["params"], z, k)

    def d_loss(params, x):
        return jnp.sum(jax.nn.softplus(d.apply({"params": params}, x)))

    d_bwd = jax.jit(lambda p, x: jax.grad(d_loss)(p, x))
    bench("D fwd+bwd", d_bwd, dv["params"], img)

    def aug_d_loss(params, x, k):
        xa = aug(x, jnp.asarray(0.5), k)
        return jnp.sum(jax.nn.softplus(d.apply({"params": params}, xa)))

    aug_d_bwd = jax.jit(lambda p, x, k: jax.grad(aug_d_loss)(p, x, k))
    bench("augment+D fwd+bwd", aug_d_bwd, dv["params"], img, k)

    def r1_loss(params, x, k):
        def dsum(xi):
            return jnp.sum(d.apply({"params": params}, aug(xi, jnp.asarray(0.5), k)))

        grads = jax.grad(dsum)(x)
        return jnp.sum(jnp.square(grads))

    r1 = jax.jit(lambda p, x, k: jax.grad(r1_loss)(p, x, k))
    bench("R1 double-backward (w/ aug)", r1, dv["params"], img, k)


if __name__ == "__main__":
    main()
