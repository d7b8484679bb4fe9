"""Time each compiled step variant and each loss phase at the bench config."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gantrack_tpu.models.stylegan2 import Discriminator, Generator
from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
from gantrack_tpu.training import (
    StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
    create_train_state, lazy_reg_adam,
)
from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config


def timeit(name, fn, *args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)


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
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=zdim, c_dim=0, img_resolution=res, img_channels=1,
    )
    augment = AugmentPipe(medical_augment_config(), res, res, 1)
    loss = StyleGAN2Loss(
        g, d, StyleGAN2LossConfig(r1_gamma=0.4096, style_mixing_prob=0.9, pl_weight=2.0),
        augment_fn=augment,
    )
    cfg = TrainStepConfig(batch_size=batch, z_dim=zdim, ada_target=0.6)
    mesh = create_mesh(1)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)

    imgs = shard_batch(mesh, jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, res, res, 1)), jnp.float32
    ))
    zeros_c = jnp.zeros((batch, 0), jnp.float32)

    # Phase-level timings (jit of raw loss fns, single device, no shard_map).
    vars_d = {"params": state.params_d}
    extras_g = {"emas": state.emas_g, **state.consts_g}
    k = jax.random.PRNGKey(1)

    gmain = jax.jit(lambda p: jax.value_and_grad(loss.gmain, has_aux=True)(
        p, extras_g, vars_d, jnp.zeros((batch, zdim)), None, k, jnp.asarray(0.5),
        jnp.asarray(0.0)))
    timeit("gmain grad", gmain, state.params_g)

    gpl = jax.jit(lambda p: jax.value_and_grad(loss.gpl, has_aux=True)(
        p, extras_g, jnp.zeros((batch, zdim)), None, k, jnp.asarray(0.0)))
    timeit("gpl grad (double bwd)", gpl, state.params_g)

    vars_g = {"params": state.params_g, **extras_g}
    dmain = jax.jit(lambda p: jax.value_and_grad(loss.dmain, has_aux=True)(
        p, vars_g, jnp.zeros((batch, zdim)), None, imgs, zeros_c, k,
        jnp.asarray(0.5), jnp.asarray(0.0)))
    timeit("dmain grad", dmain, state.params_d)

    dr1 = jax.jit(lambda p: jax.value_and_grad(loss.dr1, has_aux=True)(
        p, imgs, zeros_c, k, jnp.asarray(0.5), jnp.asarray(0.0)))
    timeit("dr1 grad (double bwd)", dr1, state.params_d)

    # Full step variants (state is donated: thread it through).
    for key in [(False, False), (True, False), (True, True)]:
        fn = stepper.get(*key)
        s = jax.tree.map(jnp.copy, state)
        s, _ = fn(s, imgs, zeros_c)  # compile
        jax.block_until_ready(s.params_g)
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            s, _ = fn(s, imgs, zeros_c)
        jax.block_until_ready(s.params_g)
        print(f"step variant gpl={key[0]} dr1={key[1]:5}  "
              f"{(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
